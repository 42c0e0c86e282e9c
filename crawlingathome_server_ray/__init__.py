"""crawlingathome_server_ray — a Ray-Data-native URL-frontier + fetch scheduler.

A brand-new engine with the query/data-processing capabilities of the
reference ``TheoCoombes/crawlingathome-server`` (a FastAPI+Postgres+Redis
distributed-crawl coordinator, see /root/reference/main.py), re-expressed
Ray-Data-first:

- the ``Job`` frontier table (reference models.py:10-47) becomes a Parquet
  ``pages`` dataset streamed through ``ray.data`` pipelines;
- the atomic job dispatcher (reference models.py:105-131) becomes a
  deterministic seeded permutation over hash partitions;
- dedup-by-shard-number (reference update_db.py:98-105) becomes a sharded
  bloom URL-seen filter over canonicalized URL hashes (actor pool);
- leaderboards / counts / ETA (reference main.py:96-164, 762-808) become
  groupby-aggregate pipelines and checkpoint counter snapshots.

No code is ported; all file:line references are behavioural citations only.
"""

from .config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
