"""PySpark-native sitemap-driven URL frontier + fetch scheduler.

A brand-new engine with the query/data-processing capabilities of
GateNLP/ultimate-sitemap-parser (reference at /root/reference), re-expressed
Spark-first: the reference's recursive depth-first fetch loop becomes an
iterative wave loop over a frontier DataFrame, and its Expat payload parsers
become a vectorized Arrow parse kernel applied via ``mapInPandas``.

Public surface:

- :func:`frontier.waves.sitemap_tree_for_homepages` — flagship (reference
  ``usp.tree.sitemap_tree_for_homepage``, tree.py:42-130), many seeds at once.
- :func:`frontier.waves.sitemap_from_str` — reference tree.py:133-142.
- :mod:`frontier.parse` — the multi-format parse kernel (robots / XML urlset /
  XML sitemapindex / RSS 2.0 / Atom 0.3+1.0 / plain text).
- :mod:`frontier.schedule` — per-host politeness priority queue (north rule).
- :mod:`frontier.dedup` — Bloom-prefiltered exact URL-seen set (north rule).
- :mod:`frontier.datapipe` — large-scale training-data pipeline operators
  (dedup families, similarity search, text analysis, multimodal plumbing).
- :mod:`frontier.robots` — RFC 9309 Allow/Disallow/Crawl-delay rules engine
  + :func:`frontier.robots.crawl_fetch_plan`, the north rule end-to-end
  (discovery → rules → per-host budgets → priority-queue fetch plan).
- :mod:`frontier.pages` — Common-Crawl-style pages-corpus surface
  (byte-exact HTML→text extraction, seed derivation, recrawl dedup).
"""

__version__ = "0.1.0"
