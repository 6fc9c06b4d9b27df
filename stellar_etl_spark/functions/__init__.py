"""Column-function library: scalar conversions, text analysis, dedup
signatures, similarity search, multimodal plumbing. Everything JVM-side
(`pyspark.sql.functions`) unless a pandas UDF is genuinely required."""
