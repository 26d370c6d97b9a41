"""Service entrypoint: the drop-in runtime shape of the reference.

``python -m data_warehouse_spark`` boots the same two loops the reference
runs (Main.scala / boot modules): the primary-storage exploration cadence
(2 s single-flight ticks) and the GraphQL HTTP server, with StatsD metrics
and graceful SIGTERM shutdown.

Configuration via environment (the reference's DATA_WAREHOUSE_* convention —
application.conf:46-111):

  DATA_WAREHOUSE_PRIMARY_STORAGE_PATH    primary storage root (default /data)
  DATA_WAREHOUSE_SECONDARY_STORAGE_PATH  warehouse table dir (default /warehouse)
  DATA_WAREHOUSE_HTTP_PORT               GraphQL/health port (default 8080)
  DATA_WAREHOUSE_EXPLORATION_INTERVAL    seconds between ticks (default 2)
  DATA_WAREHOUSE_STATSD_ENDPOINT         host:port for metrics (off if empty)
"""

from __future__ import annotations

import logging
import os
import signal
import threading

log = logging.getLogger("data_warehouse_spark.service")


class Service:
    def __init__(
        self,
        spark=None,
        primary_root: str | None = None,
        warehouse_root: str | None = None,
        http_port: int | None = None,
        tick_seconds: float | None = None,
        statsd=None,
    ):
        from .metrics import StatsD
        from .session import get_spark
        from .streaming.ingest import IngestionPipeline, warehouse_store

        self.spark = spark or get_spark(app_name="data-warehouse")
        self.primary_root = primary_root or os.environ.get(
            "DATA_WAREHOUSE_PRIMARY_STORAGE_PATH", "/data"
        )
        warehouse_root = warehouse_root or os.environ.get(
            "DATA_WAREHOUSE_SECONDARY_STORAGE_PATH", "/warehouse"
        )
        self.http_port = http_port or int(os.environ.get("DATA_WAREHOUSE_HTTP_PORT", "8080"))
        self.tick_seconds = tick_seconds or float(
            os.environ.get("DATA_WAREHOUSE_EXPLORATION_INTERVAL", "2")
        )
        self.statsd = statsd or StatsD()
        self.store = warehouse_store(self.spark, warehouse_root)
        self.pipeline = IngestionPipeline(self.spark, self.primary_root, self.store)
        self._stop = threading.Event()
        self._ingest_thread: threading.Thread | None = None

    # --- ingestion loop (explorer actor equivalent) ---------------------
    def _ingest_loop(self) -> None:
        # every Spark job this thread submits runs in the "ingest" pool —
        # under FAIR scheduling (session.py) a long tick shares the cluster
        # with serving jobs instead of convoying them (the reference's
        # two-pool isolation, application.conf:66-109)
        try:
            self.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", "ingest"
            )
        except Exception:  # pragma: no cover - session without a live sc
            pass
        while not self._stop.is_set():
            started = self._now()
            try:
                m = self.pipeline.run_once()
                self.statsd.emit_tick(m)
                self.statsd.emit_memory()
            except Exception:  # supervisor-restart semantics: log, retry next tick
                log.exception("exploration tick failed; will retry")
            elapsed = self._now() - started
            self._stop.wait(max(0.0, self.tick_seconds - elapsed))

    @staticmethod
    def _now() -> float:
        import time

        return time.monotonic()

    def start_ingestion(self) -> None:
        self._ingest_thread = threading.Thread(
            target=self._ingest_loop, name="exploration", daemon=True
        )
        self._ingest_thread.start()

    def stop(self) -> None:
        """Graceful: finish the in-flight tick, then stop (KillSwitch/D11)."""
        self._stop.set()
        if self._ingest_thread is not None:
            self._ingest_thread.join(timeout=60)

    # --- HTTP -----------------------------------------------------------
    def build_app(self):
        from .api.http import build_app

        return build_app(self.store)

    def run(self) -> None:
        self.start_ingestion()
        app = self.build_app()
        signal.signal(signal.SIGTERM, lambda *_: self.stop())
        try:
            app.run(host="0.0.0.0", port=self.http_port, use_reloader=False)
        finally:
            self.stop()
            self.spark.stop()


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    Service().run()


if __name__ == "__main__":
    main()
