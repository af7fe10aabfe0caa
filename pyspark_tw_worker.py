"""Python-worker shim: mtime-guarded zip cache invalidation for 3.11 workers.

Why this exists: pyspark's per-task bootstrap (``setup_spark_files`` in
``pyspark/worker_util.py``) calls ``importlib.invalidate_caches()`` on EVERY
task. On CPython ≤ 3.11, ``zipimport.zipimporter.invalidate_caches()``
unconditionally re-reads the *entire* zip central directory — and a stock
local-mode worker holds ~16 zip-backed path entries (pyspark's shipped zips,
py4j, ``addPyFile`` archives) of ~1.7k entries each. Measured on this
interpreter: **~125 ms of pure zip re-parsing per task**, the dominant fixed
cost of every Spark python job (a no-op job drops from ~150 ms to ~25 ms with
the guard). CPython 3.12+ fixed this upstream by re-reading only when the
archive mtime changed; this shim backports exactly that semantics, then
delegates everything to the stock ``pyspark.worker``.

Wiring: ``session.get_spark`` sets ``spark.python.worker.module`` to this
module for ``local[*]`` masters (the daemon only honors worker modules whose
name starts with ``pyspark``, hence the filename) and prepends this file's
directory to the inherited ``PYTHONPATH``. On a multi-executor cluster, ship
it explicitly::

    spark-submit --files pyspark_tw_worker.py \
      --conf spark.executorEnv.PYTHONPATH=. \
      --conf spark.python.worker.module=pyspark_tw_worker ...

Kill switch: ``TWSPARK_WORKER_PATCH=0`` (session.py then leaves the conf
unset). On 3.12+ the patch is a no-op and the stock worker runs unchanged.
"""

from __future__ import annotations

import os
import sys

if sys.version_info < (3, 12):
    import zipimport

    _orig_invalidate = zipimport.zipimporter.invalidate_caches

    def _invalidate_if_changed(self) -> None:
        """CPython 3.12 behavior: skip the directory re-read when the
        archive's mtime is unchanged since the last (re)read."""
        try:
            mtime = os.stat(self.archive).st_mtime
        except OSError:
            _orig_invalidate(self)
            return
        if getattr(self, "_tw_seen_mtime", None) == mtime:
            return
        _orig_invalidate(self)
        self._tw_seen_mtime = mtime

    zipimport.zipimporter.invalidate_caches = _invalidate_if_changed

from pyspark.worker import main  # noqa: E402,F401  (daemon entry point)

if __name__ == "__main__":
    # daemon-less mode (spark.python.use.daemon=false): mirror
    # pyspark/worker.py's __main__ connection bootstrap exactly.
    from pyspark.serializers import write_int
    from pyspark.util import local_connect_and_auth

    conn_info = os.environ.get(
        "PYTHON_WORKER_FACTORY_SOCK_PATH", int(os.environ.get("PYTHON_WORKER_FACTORY_PORT", -1))
    )
    auth_secret = os.environ.get("PYTHON_WORKER_FACTORY_SECRET")
    (sock_file, _) = local_connect_and_auth(conn_info, auth_secret)
    write_int(os.getpid(), sock_file)
    sock_file.flush()
    try:
        main(sock_file, sock_file)
    finally:
        sock_file.close()
