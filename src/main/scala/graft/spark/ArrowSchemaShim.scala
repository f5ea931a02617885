package org.apache.spark.sql.graft

import org.apache.arrow.vector.ipc.WriteChannel
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

/** Spark StructType -> serialized Arrow IPC schema message, the byte
 *  shape the reference's `get_table_schema` RPC returns (its backend
 *  serializes the table's Arrow schema). Lives in the `sql` shim
 *  package because `ArrowUtils` is `private[sql]`. */
object ArrowSchemaShim {
  def toArrowIpcBytes(schema: StructType, timeZoneId: String = "UTC"): Array[Byte] = {
    val arrow = ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val out = new ByteArrayOutputStream()
    MessageSerializer.serialize(new WriteChannel(Channels.newChannel(out)), arrow)
    out.toByteArray
  }
}
