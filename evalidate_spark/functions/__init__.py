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
  plumbing (schema, Arrow-batched decode/feature UDFs; decode is REAL
  for JPEG/PNG/BMP/WAV via :mod:`.codecs`/:mod:`.jpeg` and for AVI
  video via :mod:`.avi`; only non-AVI containers, e.g. MP4, remain
  honestly stubbed behind the ``decoded=false`` contract)
* :mod:`evalidate_spark.functions.codecs`     — zero-dependency PNG
  (stdlib zlib) + BMP + WAV encode/decode, nearest-neighbour resample
* :mod:`evalidate_spark.functions.jpeg`       — zero-dependency baseline
  JPEG codec (numpy Huffman + DCT; 4:4:4/4:2:2/4:2:0, restart markers)
* :mod:`evalidate_spark.functions.avi`        — zero-dependency AVI
  (RIFF) container mux/demux for MJPEG and uncompressed-DIB streams
* :mod:`evalidate_spark.functions.perceptual` — dHash image, spectral
  audio, and per-frame video perceptual hashing + near-dup banding
* :mod:`evalidate_spark.functions.web`        — URL canonicalisation and
  domain extraction
* :mod:`evalidate_spark.functions.classifier` — lightweight quality
  classifier scoring over document features
* :mod:`evalidate_spark.functions.sampling`   — deterministic hash
  sampling (stateless + stratified quotas) and token-budget sequence
  packing

Everything is built from JVM-side ``pyspark.sql.functions`` expressions
unless Python is genuinely required, in which case Arrow-batched pandas
UDFs are used (never per-row Python).
"""

from . import (  # noqa: F401
    avi,
    bpe,
    classifier,
    codecs,
    dedup,
    jpeg,
    multimodal,
    perceptual,
    sampling,
    semistructured,
    similarity,
    text,
    web,
)
