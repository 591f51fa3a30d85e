#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission.

    python tools/make_pyfiles.py [out.zip]

then (north-rule launch shape, two cluster sizes N and 4N executors):

    spark-submit \\
      --master <cluster> --deploy-mode cluster \\
      --num-executors <N|4N> --executor-cores 4 \\
      --py-files rtsw_spark.zip \\
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
      --conf spark.sql.adaptive.enabled=true \\
      --conf spark.sql.streaming.stateStore.providerClass=\\
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \\
      --conf spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true \\
      your_job.py

``session.get_spark`` applies the same confs for local runs and ships this
zip automatically via ``addPyFile`` (the local analogue of --py-files).
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "rtsw_spark.zip")
    base = out[:-4] if out.endswith(".zip") else out
    pkg = os.path.join(REPO, "real_time_sliding_window_spark")
    path = shutil.make_archive(base, "zip", REPO, os.path.basename(pkg))
    print(path)


if __name__ == "__main__":
    main()
