"""StatsD metrics emitter (operational parity with the reference's metrics
surface — StatsDClient.scala + MemoryMonitorActor.scala).

Emitted series (names match the reference's observable set, prefix
configurable):
  <prefix>.discovery.tenant / .account / .transfer   counters per tick
  <prefix>.memory.bytes                              gauge

Plain UDP datagrams in the statsd line format (``name:value|c`` /
``name:value|g``) — fire-and-forget, never blocks or fails the pipeline.
"""

from __future__ import annotations

import os
import socket


class StatsD:
    def __init__(self, endpoint: str | None = None, prefix: str = "dwh"):
        endpoint = endpoint or os.environ.get("DATA_WAREHOUSE_STATSD_ENDPOINT", "")
        self.prefix = prefix
        self._addr: tuple[str, int] | None = None
        self._sock: socket.socket | None = None
        if endpoint:
            host, _, port = endpoint.partition(":")
            self._addr = (host or "127.0.0.1", int(port or 8125))
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    @property
    def enabled(self) -> bool:
        return self._addr is not None

    def _send(self, line: str) -> None:
        if self._sock and self._addr:
            try:
                self._sock.sendto(line.encode(), self._addr)
            except OSError:
                pass  # metrics must never take down ingestion

    def count(self, name: str, value: int) -> None:
        if value:
            self._send(f"{self.prefix}.{name}:{value}|c")

    def gauge(self, name: str, value: int) -> None:
        self._send(f"{self.prefix}.{name}:{value}|g")

    def emit_tick(self, m) -> None:
        """Discovery counters for one ingestion tick (TickMetrics)."""
        self.count("discovery.tenant", m.tenants_discovered)
        self.count("discovery.account", m.accounts_discovered)
        self.count("discovery.transfer", m.transfers_discovered)

    def emit_memory(self) -> None:
        import resource

        rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        self.gauge("memory.bytes", rss_kb * 1024)
