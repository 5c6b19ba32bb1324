"""Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the capabilities of SAVA
(szhu33/Distributed-Graph-Computing-Platform, a Go Pregel-style BSP
graph engine — see SURVEY.md) as idiomatic Ray Data pipelines:

- ingest: Common-Crawl-style pages (url, warc_ts, html, text, lang)
  -> link extraction -> url dictionary encoding -> partitioned CSR
  adjacency shards in Parquet/npy (``pipelines.ingest``)
- engine: a generic BSP superstep loop where each superstep is ONE
  hash-partitioned message shuffle (``engine``); vertex state streams
  through per-iteration Parquet checkpoints (resumable by design)
- algorithms: PageRank, SSSP, connected components, label
  propagation (``algorithms``), triangle counting
  (``pipelines.triangles``), each matching the reference's numeric
  semantics (SURVEY.md §2.11)
- training-data ops: exact/MinHash-LSH/SimHash dedup, ANN similarity
  search, text analysis, multimodal stubs (``stages``/``pipelines``)

Nothing in this package calls ``ray.init()``; the caller owns the
Ray session (driver, pytest fixture, or bench.py).
"""

__version__ = "0.1.0"
