"""Reusable dataflow operators beyond the reference's surface.

The training-data-pipeline operator families (BASELINE.json north star):

- ``dedup``: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
- ``similarity``: brute-force cosine top-k + LSH-bucketed ANN
- ``text``: tokenization, language-ID heuristic, quality scoring,
  polynomial fingerprinting
- ``multimodal``: opaque-binary column plumbing with stubbed decoders

All hot paths are native Column expressions (JVM-side, codegen'd);
Python appears only in clearly-marked mapInPandas stubs for multimodal
decode, where a real deployment would plug in image/audio libraries.
"""
