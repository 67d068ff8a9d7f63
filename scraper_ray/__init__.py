"""scraper_ray — a Ray-Data-native crawl + data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference scraper (epyonchen/Scraper, surveyed in
/root/repo/SURVEY.md), re-expressed as ray.data.Dataset pipelines:

- ``scraper_ray.canonicalize`` — RFC 3986 URL normalization + SHA-1 keys
- ``scraper_ray.synthweb``     — deterministic synthetic web (fixture F3)
- ``scraper_ray.state.seen``   — sharded cuckoo-filter URL-seen actor pool
- ``scraper_ray.state.scheduler`` — per-domain politeness scheduler actors
- ``scraper_ray.stages``       — fetch/parse map_batches stages
- ``scraper_ray.crawl``        — the wave-loop driver (frontier iteration)
- ``scraper_ray.oracle``       — sequential reference-semantics oracle
- ``scraper_ray.functions``    — scalar/vector function library (geocode,
  strings, json-flatten)
- ``scraper_ray.pipelines``    — relational / dedup / text / ANN pipelines
  over Arrow batches

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the caller (tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"
