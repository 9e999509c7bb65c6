"""O6 — SocketIO push sink.

Reference: SocketIOProcessor (sockets/SocketIOProcessor.java:52;
connection setup :184-248, send :258-298). The NiFi processor holds a
persistent SocketIO client and, per FlowFile, either emit(event, msg)
with a per-record event name (EL-resolved, :269) or send(msg)
(:282-294); SSL via context service (:200-214); 10 s connect timeout
default (:118-125).

Spark mapping (SURVEY.md §4 custom-work #4): a foreachPartition /
foreachBatch sink. One client per partition (the analog of the
processor's per-node persistent connection): connection setup is
amortized over the partition's rows, and partition count — not row
count — bounds concurrent connections to the server.

The transport is injected (``client_factory``) so tests run against an
in-memory collector; production passes a python-socketio factory. The
payload column is pre-serialized JSON (to_json upstream), matching the
reference sending the FlowFile body verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..provenance import ProvenanceLog


class CollectingClient:
    """In-memory stand-in for a SocketIO client (tests/F6)."""

    def __init__(self) -> None:
        self.sent: list[tuple[str | None, str]] = []
        self.connected = False
        self.url: str | None = None

    def connect(self, url: str, timeout_s: float = 10.0) -> None:
        self.connected = True
        self.url = url

    def emit(self, event: str, msg: str) -> None:
        self.sent.append((event, msg))

    def send(self, msg: str) -> None:
        self.sent.append((None, msg))

    def disconnect(self) -> None:
        self.connected = False


def socketio_client_factory(tls: dict[str, Any] | None = None) -> Any:
    """Production factory: python-socketio when installed; otherwise
    the vendored stdlib-only polling client (sinks/socketio_polling.py
    — the same public Socket.IO v5 wire protocol over HTTP
    long-polling, so the sink stays functional AND loopback-testable
    in environments that never install the optional extra, this
    container included).

    ``tls`` mirrors the reference's SSL context service
    (SocketIOProcessor.java:200-214 builds an SSLContext from the
    configured service and hands it to the client): keys ``verify``
    (bool or CA bundle path) and ``client_cert`` ((cert, key) path
    tuple) — applied via a requests session on python-socketio, via an
    ssl.SSLContext on the vendored client."""
    try:
        import socketio  # type: ignore
    except ImportError:
        import ssl

        from .socketio_polling import PollingSocketIOClient

        ctx: Any = None
        if tls:
            if tls.get("verify") is False:
                ctx = ssl.create_default_context()
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            elif isinstance(tls.get("verify"), str):
                ctx = ssl.create_default_context(cafile=tls["verify"])
            if tls.get("client_cert"):
                ctx = ctx or ssl.create_default_context()
                ctx.load_cert_chain(*tls["client_cert"])
        return PollingSocketIOClient(ssl_context=ctx)
    if not tls:
        return socketio.Client()
    import requests  # type: ignore  # ships with python-socketio's deps

    session = requests.Session()
    if "verify" in tls:
        session.verify = tls["verify"]
    if tls.get("client_cert"):
        session.cert = tuple(tls["client_cert"])
    return socketio.Client(http_session=session, ssl_verify=tls.get("verify", True))


@dataclass
class SocketIOSink:
    """Push a DataFrame's payload column to a SocketIO server.

    mode='emit' uses per-record event names (event_col), mode='send'
    uses the bare send channel — mirroring the reference's two paths
    (SocketIOProcessor.java:282-294).
    """

    url: str
    payload_col: str = "payload"
    event_col: str | None = None  # per-record event name (emit mode)
    # Per-record URL (the reference EL-resolves the url per FlowFile,
    # SocketIOProcessor.java:84,111). One client per DISTINCT url per
    # partition, connected lazily and reused — the EL-per-record
    # semantics without a connect per row.
    url_col: str | None = None
    static_event: str | None = None
    mode: str = "emit"  # emit | send
    connect_timeout_s: float = 10.0
    client_factory: Callable[..., Any] = socketio_client_factory
    # TLS config, the SSL-context-service analog (SocketIOProcessor.
    # java:200-214): verify = True | False | CA-bundle path;
    # client_cert = (cert_path, key_path) for mutual TLS. Passed to
    # the client factory as `tls=` when the factory declares the
    # parameter; factories that don't take it (e.g. test collectors)
    # are called bare — the knobs are then accepted but inert.
    ssl_verify: bool | str = True
    ssl_client_cert: tuple[str, str] | None = None
    # Provenance SEND events per batch (SocketIOProcessor.java:296 analog).
    provenance: ProvenanceLog = field(default_factory=ProvenanceLog)

    def _tls_config(self) -> dict[str, Any] | None:
        if self.ssl_verify is True and self.ssl_client_cert is None:
            return None  # defaults: plain client, no session wrapping
        cfg: dict[str, Any] = {"verify": self.ssl_verify}
        if self.ssl_client_cert is not None:
            cfg["client_cert"] = self.ssl_client_cert
        return cfg

    def _bind_factory(self) -> Callable[[], Any]:
        """Resolve TLS binding at the DRIVER (inspect doesn't belong in
        an executor closure): factories declaring a `tls` parameter get
        the sink's SSL config; others are called bare."""
        import functools
        import inspect

        try:
            accepts_tls = "tls" in inspect.signature(self.client_factory).parameters
        except (TypeError, ValueError):
            accepts_tls = False
        if accepts_tls:
            return functools.partial(self.client_factory, tls=self._tls_config())
        return self.client_factory

    def write_batch(self, df: DataFrame) -> int:
        """Batch mode: foreachPartition with one client per partition.

        Returns the number of rows actually pushed, counted by an
        accumulator incremented inside the push closure — ONE job runs
        the pipeline. (An earlier draft called out.count() after the
        foreachPartition, recomputing the whole upstream plan a second
        time; with a nondeterministic upstream the logged count could
        even disagree with what was pushed.)"""
        cols = [F.col(self.payload_col).alias("payload")]
        if self.mode == "emit":
            if self.event_col:
                cols.append(F.col(self.event_col).alias("event"))
            else:
                cols.append(F.lit(self.static_event or "message").alias("event"))
        if self.url_col:
            cols.append(F.col(self.url_col).alias("url"))
        out = df.select(*cols)
        url = self.url
        per_record_url = self.url_col is not None
        mode = self.mode
        timeout = self.connect_timeout_s
        factory = self._bind_factory()
        pushed = df.sparkSession.sparkContext.accumulator(0)

        def push(rows) -> None:
            clients: dict[str, Any] = {}

            def client_for(u: str) -> Any:
                if u not in clients:
                    c = factory()
                    # python-socketio's connect() takes the timeout as
                    # the KEYWORD wait_timeout — its second positional
                    # is `headers`, so c.connect(u, timeout) handed the
                    # float to the header merge and crashed the real
                    # client (only the test stubs matched positionally)
                    try:
                        c.connect(u, wait_timeout=timeout)
                    except TypeError:
                        c.connect(u)  # stub/simple clients: no kwarg
                    clients[u] = c
                return clients[u]

            n = 0
            try:
                for row in rows:
                    client = client_for(row["url"] if per_record_url else url)
                    if mode == "emit":
                        client.emit(row["event"], row["payload"])
                    else:
                        client.send(row["payload"])
                    n += 1
            finally:
                for c in clients.values():
                    c.disconnect()
            pushed.add(n)

        with self.provenance.send(self.url, detail=f"mode={mode}") as ctx:
            out.foreachPartition(push)
            ctx["n_rows"] = pushed.value
        # the accumulator is the local truth; events[-1] could be
        # another sink's event when the ProvenanceLog is shared
        return pushed.value

    def stream_writer(self, df: DataFrame, checkpoint: str, **options):
        """Streaming mode: foreachBatch wrapper over write_batch."""

        def handle(batch_df: DataFrame, _epoch: int) -> None:
            self.write_batch(batch_df)

        return (
            df.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .options(**options)
        )
