"""North-star LLM-data-pipeline operators (BASELINE.json): dedup, similarity
search, text analysis, multimodal columns. All designed long-format-native
and shuffle-scalable; built-in expressions (whole-stage codegen) everywhere,
Arrow-batched pandas UDFs only where Spark lacks the primitive."""
