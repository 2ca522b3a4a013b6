"""Sources & sinks: testdata/synthetic parquet readers, checkpoint store."""
