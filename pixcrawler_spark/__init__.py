"""pixcrawler_spark — a PySpark-native URL-frontier / fetch-scheduler engine.

A from-scratch, Spark-first rebuild of the query & data-processing
capabilities of the reference crawler (alaamer12/PixCrawler): a URL
frontier + fetch scheduler over Common-Crawl-style page tables
(url, warc_ts, html, text, lang), with

- exact + probabilistic (bloom) URL-seen sets,
- per-domain politeness (robots rules + crawl-delay token buckets),
- a window-ranked priority queue per micro-round,
- vectorized (Arrow) text / outlink extraction,
- a full dedup suite (exact, minhash-LSH, simhash, n-gram jaccard,
  embedding cosine),
- text analytics (lang-id, quality, tokens, fingerprints), and
- similarity search over embedding columns.

Everything is declarative DataFrame/SQL so Catalyst + AQE choose the
physical plan; Python touches data only through Arrow-batched pandas
UDFs (never row-at-a-time).
"""

__version__ = "0.1.0"
