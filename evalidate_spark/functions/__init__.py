"""Training-data pipeline operations over document tables — the
beyond-the-reference operator families a 100 TB corpus pipeline needs:

* :mod:`evalidate_spark.functions.text`       — token counts, quality
  scoring, language-ID heuristic, fingerprinting, shingling
* :mod:`evalidate_spark.functions.bpe`        — real vocab-merge (BPE)
  tokenizer: distributed word counts → driver-side merge learning →
  Arrow-batched greedy longest-match counting
* :mod:`evalidate_spark.functions.dedup`      — exact, MinHash+LSH,
  SimHash, n-gram Jaccard near-duplicate detection
* :mod:`evalidate_spark.functions.similarity` — brute-force cosine top-k
  baseline + LSH-bucketed ANN scale path over embedding columns
* :mod:`evalidate_spark.functions.multimodal` — binary media payload
  plumbing (schema, Arrow-batched decode/feature UDFs; decode is REAL for
  PNG/BMP/WAV via :mod:`.codecs`, stubbed for JPEG/video — codec
  libraries are not available in this sandbox)
* :mod:`evalidate_spark.functions.codecs`     — zero-dependency PNG
  (stdlib zlib) + BMP + WAV encode/decode, nearest-neighbour resample
* :mod:`evalidate_spark.functions.sampling`   — deterministic hash
  sampling (stateless + stratified quotas) and token-budget sequence
  packing

Everything is built from JVM-side ``pyspark.sql.functions`` expressions
unless Python is genuinely required, in which case Arrow-batched pandas
UDFs are used (never per-row Python).
"""

from . import bpe, codecs, dedup, multimodal, sampling, similarity, text  # noqa: F401
