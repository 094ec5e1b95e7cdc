"""Config-file parser (SURVEY.md R9 / EP1 — the reference's only "planner").

Parses the reference's line-based .conf format (reference: OPC2MongoDB/
Program.cs:1212-1296; example OPC2MongoDB/opc2mongodb.conf):

- ``mongodb://...``                       → sink connection string (:1229)
- ``opc.tcp://URL, PERIOD, NAME[, CERT, PASS]`` → OPC UA server (:1234)
- ``opcda://URL, PERIOD, NAME``           → OPC DA server (:1257)
- ``PATH, TYPE, SUBSCRIBE, MONGO_TAG``    → tag entry for the current
  server (:1273); MONGO_TAG blank → defaults to PATH (:1283); TYPE blank →
  the entry is marked for inference — the reference asks the live server
  via ``client.GetDataType(path)`` (:131-135, :451-453); here the live
  client resolves it once per session (sources/opc_live.py) and offline
  sources take a declared lookup (``apply_type_lookup``)
- ``#`` comments and blank lines skipped  (:1222-1228)

The parsed topology feeds the ``opcsim`` data source options — the Spark
twin of "the List<OPC_server> IS the physical plan" (SURVEY.md §3 EP1):
each server becomes a source partition instead of an OS thread.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TagEntry:
    opc_path: str
    opc_type: str
    subscribe: bool
    mongo_tag: str

    @property
    def infer_type(self) -> bool:
        """Blank TYPE column → the type must be inferred (reference:
        Program.cs:131-135 asks the live server; :452 notes inference is
        unreliable and declared types are preferred)."""
        return not self.opc_type


@dataclass
class ServerConfig:
    url: str
    name: str
    read_period: int
    is_ua: bool
    certificate_file: str = ""
    certificate_password: str = ""
    entries: list[TagEntry] = field(default_factory=list)


@dataclass
class OpcTopology:
    mongo_url: str = ""
    servers: list[ServerConfig] = field(default_factory=list)


def parse_config(text: str) -> OpcTopology:
    topo = OpcTopology()
    current: ServerConfig | None = None
    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("mongodb://"):
            topo.mongo_url = line
            continue
        fields = [f.strip() for f in line.split(",")]
        if fields[0].startswith("opc.tcp://") or fields[0].startswith("opcda://"):
            is_ua = fields[0].startswith("opc.tcp://")
            current = ServerConfig(
                url=fields[0],
                read_period=int(fields[1]) if len(fields) > 1 and fields[1] else 10,
                name=(fields[2] if len(fields) > 2 and fields[2] else fields[0]),
                is_ua=is_ua,
                certificate_file=fields[3] if len(fields) > 3 else "",
                certificate_password=fields[4] if len(fields) > 4 else "",
            )
            topo.servers.append(current)
            continue
        if len(fields) >= 3:
            if current is None:
                # tag line before any server line — reference logs and skips
                continue
            path = fields[0]
            mongo_tag = fields[3] if len(fields) > 3 and fields[3] else path
            current.entries.append(
                TagEntry(
                    opc_path=path,
                    opc_type=fields[1],
                    subscribe=fields[2].upper().startswith("Y"),
                    mongo_tag=mongo_tag,
                )
            )
    return topo


def apply_type_lookup(topo: OpcTopology, lookup: dict[str, str]) -> list[str]:
    """Fill blank-TYPE entries from a declared ``{opc_path: type}`` lookup —
    the offline twin of the reference's live ``GetDataType`` inference
    (Program.cs:131-135). Entries with a declared type are never overridden
    (the reference only infers when the conf column is blank). Returns the
    paths still blank after the lookup, so a caller without a live server
    can fail loudly instead of shipping an uncoercible dataType."""
    missing: list[str] = []
    for srv in topo.servers:
        for e in srv.entries:
            if e.infer_type:
                e.opc_type = lookup.get(e.opc_path, "")
                if not e.opc_type:
                    missing.append(e.opc_path)
    return missing


def parse_config_file(path: str) -> OpcTopology:
    with open(path, encoding="utf-8") as f:
        return parse_config(f.read())


def topology_df(spark, conf_path: str):
    """The parsed topology as a queryable DataFrame — one row per server
    with its connection/auth posture (reference: OPC2MongoDB/
    Program.cs:104-121 loads CERT/PASS into an X509Certificate2 for the UA
    session; DA servers are always anonymous).

    This is the swap-point contract for a live connector: everything a real
    OPC client session needs (url, protocol, poll period, auth mode, tag
    count) is carried here; ``opcsim`` consumes the same topology and only
    the per-sweep value fetch is simulated.
    """
    topo = parse_config_file(conf_path)
    rows = [
        (
            s.name,
            s.url,
            "ua" if s.is_ua else "da",
            s.read_period,
            ("certificate" if s.certificate_file else "anonymous")
            if s.is_ua
            else "anonymous",
            s.certificate_file or None,
            len(s.entries),
            sum(1 for e in s.entries if e.subscribe),
        )
        for s in topo.servers
    ]
    return spark.createDataFrame(
        rows,
        "server string, url string, protocol string, read_period int, "
        "auth_mode string, certificate_file string, n_tags int, n_subscribed int",
    )
