"""Run metrics actor — counters + per-wave lineage off the hot path.

The reference logs run bounds into its ``Scrapy_Logs`` table
(handlers/db.py:205-209); here every stage reports counters to one
``num_cpus=0`` actor via fire-and-forget calls, and the crawl driver
folds the totals into each wave's checkpoint manifest (north rule:
"per-partition lineage + metrics").
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters: dict[str, int] = {}

    def add(self, counters: dict[str, int]) -> None:
        for k, v in counters.items():
            self.counters[k] = self.counters.get(k, 0) + int(v)

    def get(self) -> dict[str, int]:
        return dict(self.counters)

    def reset(self) -> None:
        self.counters = {}
