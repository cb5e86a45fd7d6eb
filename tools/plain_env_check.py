"""Driver-environment simulation: execute EVERY registered query under a
PLAIN SparkSession from a NEUTRAL cwd.

The oracle harness (tools/check.py) and pytest both run from the repo
root with the tuned ``get_spark()`` session, which masks two classes of
environment bug the external driver hits:

- worker importability: cloudpickle ships module-level functions by
  reference, so kernels break when the package is importable only in
  the driver process (caught r8: every applyInPandasWithState kernel;
  fixed by the package-level register_pickle_by_value);
- tuned-session assumptions: configs (Arrow, AQE, UTC, shuffle
  partitions) or cwd-relative paths that a plain session doesn't set.

Usage: python tools/plain_env_check.py  [name ...]
(always re-executes from a temp cwd with a default-config local session)
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.chdir(tempfile.mkdtemp(prefix="plain_env_"))

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402

only = set(sys.argv[1:])
unknown = only - set(entrymod.queries())
if unknown:
    print(f"unknown query name(s): {sorted(unknown)}")
    sys.exit(2)
sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
ok = fail = 0
for name, fn in entrymod.queries().items():
    if only and name not in only:
        continue
    try:
        fn(spark, sf_dir).collect()
        ok += 1
    except Exception as ex:  # noqa: BLE001
        fail += 1
        print(f"[FAIL] {name}: {type(ex).__name__}: {str(ex)[:300]}")
print(f"\n{ok} ok, {fail} fail (plain session, cwd={os.getcwd()})")
sys.exit(1 if fail else 0)
