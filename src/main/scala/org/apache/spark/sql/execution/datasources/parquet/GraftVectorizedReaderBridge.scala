package org.apache.spark.sql.execution.datasources.parquet

/** graft's bridge into Spark's package-private `ParquetRowGroupReader` seam:
  * `VectorizedParquetRecordReader.initialize(fileSchema, requestedSchema,
  * rowGroupReader, totalRowCount)` is public, but its row-group-reader
  * parameter type is package-private, so the adapter must live in this
  * package (the same shim pattern other DSv2 connectors use). The seam lets
  * the caller own the `ParquetFileReader` — and therefore the row-group
  * FILTER: groups dropped by parquet's statistics filter never reach the
  * vectorized decoder. Nothing here touches Spark internals beyond calling
  * that public initialize overload. */
object GraftVectorizedReaderBridge {
  def init(r: VectorizedParquetRecordReader,
           fileSchema: org.apache.parquet.schema.MessageType,
           requestedSchema: org.apache.parquet.schema.MessageType,
           nextRowGroup: () => org.apache.parquet.column.page.PageReadStore,
           onClose: () => Unit,
           totalRows: Int): Unit =
    r.initialize(fileSchema, requestedSchema,
      new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup(): org.apache.parquet.column.page.PageReadStore =
          nextRowGroup()
        override def close(): Unit = onClose()
      }, totalRows)
}
