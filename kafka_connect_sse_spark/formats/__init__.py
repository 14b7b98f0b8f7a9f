"""Self-contained file-format codecs used at sink/source boundaries when
the corresponding Spark DataSource is not deployable in-container."""
