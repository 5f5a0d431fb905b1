"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's crawl operators, a 100 TB crawl corpus needs the
standard curation pipeline: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language ID, quality scoring, token
stats, winnowing fingerprints) and multimodal column plumbing. Everything
here is expressed Spark-first: built-in higher-order functions
(JVM/codegen) wherever the semantics allow, Arrow-batched pandas UDFs with
numpy vectorization only for the hash sketches that SQL cannot express.
"""

from . import dedup, images, multimodal, similarity, text  # noqa: F401
