"""Scale extensions beyond the reference surface (SURVEY §7.3 step 10):
deduplication, similarity search, text analysis, multimodal plumbing,
and event-time windows.  All hot paths are built-in Spark SQL functions
(JVM-side, whole-stage-codegen-able); Python appears only in clearly
marked Pandas-UDF stubs (multimodal decode)."""
