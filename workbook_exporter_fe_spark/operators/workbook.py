"""Workbook→config-point engine: the reference's 27 exporters, Spark-first.

The reference implements each exporter as a hand-rolled pandas row loop
(scan → filter → derive → anti-join → merge; O23 generic driver,
/root/reference/workbook_exporter-fe.py:1622-1687, dispatch :1781-1918).
Here every exporter is a declarative **spec** interpreted by one DataFrame
builder — the output is the long form
``(exporter, hostname, entry_key, field, value)`` (FIXTURES.md F4), which
flattens the reference's 2/3-level OrderedDict document so it can be
diffed, oracled, and merged set-wise.

Semantics are pinned to the reference's golden fixture
(dummy_data/example_output.yaml), not to its code, where the two disagree
(SURVEY.md §5, Appendix A): e.g. `exporter_gateway` emits the nested
hostname→ip shape without `ip_address` (example_output.yaml:911-953), the
linux/cms hostname key is the short `Hostnames` column and the port is
`App-Listen-Port` (example_output.yaml:533-849), and the dead-code
`'exporter_name'` literal-key environment writes (:138, :532) are dropped.

The hidden global port counter (:1664-1667, O17) becomes an explicit
window: missing ports get ``base + row_number() over (order by hostname)``
within the exporter — deterministic, partition-stable, no cross-run state.

Scale: specs compile to pure Column expressions + one explode; the whole
engine is a single narrow projection per exporter, unioned — Catalyst
prunes the ~35-column scan to the handful of referenced columns, and the
anti-join/merge against existing state is `operators.merge` (set-based).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LONG_SCHEMA = "exporter string, hostname string, entry_key string, field string, value string"

# Optional columns probed with row.get(...) in the reference (README.md:18);
# patched in when absent (reference pattern :229-236).
OPTIONAL_COLS = [
    "comm_string", "ssh_username", "ssh_password", "jmx_ports",
    "snmp_version", "snmp_user", "snmp_password", "TCP_Connect_Port",
    "h2xx_url", "icmp", "ssh-banner", "Environment", "OS-Listen-Port",
    "App-Listen-Port", "Exporter_SSL",
]

OS_EXPORTERS = {"exporter_linux", "exporter_windows", "exporter_verint", "exporter_vmware"}


@dataclass
class Spec:
    name: str
    shape: str = "flat"  # flat | per_ip | per_port | probes | first_row
    hostname_col: str = "Hostnames"
    port: str | int = "App-Listen-Port"  # column name, fixed int, or "counter"
    ssh_creds: bool = True  # username/password with root/ENC defaults
    snmp: str | None = None  # None | "v2v3" | "v3only" | "v2int"
    include_env: bool = False
    extra_fields: dict = field(default_factory=dict)  # literal field → value
    include_ip: bool = True
    type_case: bool = False  # acm host-type CASE
    ssl_port_rule: bool = False
    include_port: bool = True
    # field → zero-arg callable returning a Column (lazy: Column construction
    # needs an active SparkContext, and the spec catalog is import-time)
    extra_exprs: dict = field(default_factory=dict)
    field_order: tuple = ()  # explicit emission order (YAML sink fidelity)


def _ensure_optional(df: DataFrame) -> DataFrame:
    for c in OPTIONAL_COLS:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df


def _filter(df: DataFrame, name: str) -> DataFrame:
    col = "Exporter_name_os" if name in OS_EXPORTERS else "Exporter_name_app"
    return df.filter(F.col(col) == name)


def _port_col(spec: Spec, base: int) -> F.Column:
    if isinstance(spec.port, int):
        return F.lit(spec.port)
    raw = F.col(spec.port).cast("double").cast("int")
    w = Window.partitionBy(raw.isNull()).orderBy(F.col(spec.hostname_col))
    counter = F.lit(base) - 1 + F.row_number().over(w)
    return F.coalesce(raw, counter)


def _cred_fields(spec: Spec) -> list[tuple[str, F.Column]]:
    out: list[tuple[str, F.Column]] = []
    if spec.ssh_creds:
        out.append(("username", F.coalesce(F.col("ssh_username"), F.lit("root"))))
        out.append(("password", F.coalesce(F.col("ssh_password"), F.lit("ENC"))))
    if spec.snmp == "v2v3":
        v3 = (F.col("snmp_version") == "3") | (F.col("snmp_version") == "v3")
        out += [
            ("username", F.when(v3, F.col("snmp_user")).otherwise(F.lit("maas"))),
            ("privacy_protocol", F.when(v3, F.lit("aes"))),
            ("privacy_passphrase", F.when(v3, F.col("snmp_password"))),
            ("auth_protocol", F.when(v3, F.lit("sha"))),
            ("auth_passphrase", F.when(v3, F.col("snmp_password"))),
            ("community", F.when(~v3, F.coalesce(F.col("comm_string"), F.lit("ENC")))),
        ]
    elif spec.snmp == "v3only":  # exporter_network forces v3 (:1139-1144)
        out += [
            ("username", F.coalesce(F.col("snmp_user"), F.lit("maas"))),
            ("privacy_protocol", F.lit("aes")),
            ("privacy_passphrase", F.coalesce(F.col("snmp_password"), F.lit("ENC"))),
            ("auth_protocol", F.lit("sha")),
            ("auth_passphrase", F.coalesce(F.col("snmp_password"), F.lit("ENC"))),
        ]
    elif spec.snmp == "v2int":  # gateway golden shape: snmp_version 2 + community
        out += [
            ("snmp_version", F.lit(2)),
            ("community", F.coalesce(F.col("comm_string"), F.lit("ENC"))),
        ]
    return out


def _fields(spec: Spec, port: F.Column) -> list[tuple[str, F.Column]]:
    fields: list[tuple[str, F.Column]] = []
    if spec.include_ip and spec.shape in ("flat", "first_row"):
        fields.append(("ip_address", F.col("IP Address")))
    if spec.shape != "per_port" and spec.include_port:
        fields.append(("listen_port", port))
    fields += [("location", F.col("Location")), ("country", F.col("Country"))]
    if spec.include_env:
        fields.append(("environment", F.col("Environment")))
    if spec.type_case:  # acm host type (:1006-1011)
        h = F.lower(F.col(spec.hostname_col))
        fields.append(
            ("type",
             F.when(h.contains("lsp"), "lsp").when(h.contains("ess"), "ess").otherwise("acm"))
        )
    fields += _cred_fields(spec)
    for k, v in spec.extra_exprs.items():
        fields.append((k, v() if callable(v) else v))
    for k, v in spec.extra_fields.items():
        fields.append((k, F.lit(v)))
    if spec.field_order:  # reference insert order (e.g. genesyscloud :938-948)
        pos = {n: i for i, n in enumerate(spec.field_order)}
        fields.sort(key=lambda fv: pos.get(fv[0], len(pos)))
    return fields


def spec_field_order(spec: Spec) -> list[str]:
    """Emission order of a spec's fields — what the YAML sink uses to lay
    out each entry exactly as the reference inserts them."""
    if spec.shape == "probes":
        return ["module", "location", "country"]
    names = [name for name, _ in _fields(spec, F.lit(0))]
    if spec.shape == "per_port":  # run_exporter prepends ip_address there
        names = ["ip_address"] + [n for n in names if n != "ip_address"]
    return names


def _to_long(df: DataFrame, spec: Spec, entry_key, fields) -> DataFrame:
    # Two-step: window expressions (port counter) can't sit inside
    # explode(array(struct(...))) in a single projection — materialize the
    # field columns first, then explode.
    prepared = df.select(
        F.lit(spec.name).alias("exporter"),
        F.col(spec.hostname_col).alias("hostname"),
        (entry_key.cast("string") if entry_key is not None else F.lit(None).cast("string")).alias(
            "entry_key"
        ),
        *[col.cast("string").alias(f"_f{i}") for i, (_, col) in enumerate(fields)],
    )
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("field"), F.col(f"_f{i}").alias("value"))
            for i, (name, _) in enumerate(fields)
        ]
    )
    out = prepared.select(
        "exporter", "hostname", "entry_key", F.explode(pairs).alias("fv")
    ).select("exporter", "hostname", "entry_key", "fv.field", "fv.value")
    return out.filter(F.col("value").isNotNull())


def run_exporter(df: DataFrame, spec: Spec, default_port_base: int = 6001) -> DataFrame:
    """One exporter: filter → derive → shape → long rows."""
    df = _ensure_optional(df)

    if spec.name == "exporter_ssl":
        sub = df.filter(F.col("Exporter_SSL").cast("string").isin("True", "true", "TRUE", "1"))
    elif spec.name == "exporter_blackbox":
        return _blackbox(df)
    else:
        sub = _filter(df, spec.name)

    if spec.ssl_port_rule:  # 8443 if app==exporter_ssl else 443 (:360)
        port = F.when(F.col("Exporter_name_app") == "exporter_ssl", 8443).otherwise(443)
    else:
        port = _port_col(spec, default_port_base)
    fields = _fields(spec, port)

    if spec.shape == "flat":
        return _to_long(sub, spec, None, fields)
    if spec.shape == "first_row":
        # weblm semantics (reference :1049: hostname = iloc[0]['FQDN'], then
        # every row overwrites the SAME hostname dict → last row's values
        # win). The reference's iteration order is CSV row order; the
        # engine pins the deterministic analog: first/last by hostname_col
        # (the weblm path is NameError-dead in the reference (:1053) and
        # absent from the golden, so the order pin is this repo's
        # adjudication — SURVEY Appendix A).
        hc = F.col(spec.hostname_col)
        one = sub.agg(
            F.min(hc).alias(spec.hostname_col),
            *[
                F.max_by(col, hc).cast("string").alias(f"_v{i}")
                for i, (_, col) in enumerate(fields)
            ],
        )
        collapsed = [(name, F.col(f"_v{i}")) for i, (name, _) in enumerate(fields)]
        return _to_long(one, spec, None, collapsed)
    if spec.shape == "per_ip":
        return _to_long(sub, spec, F.col("IP Address"), fields)
    if spec.shape == "per_port":
        ports = F.split(F.col("jmx_ports"), ",")
        ports = F.when(F.col("jmx_ports").isNotNull(), ports).otherwise(
            F.array(F.lit("8080"), F.lit("8081"))
        )
        exploded = sub.withColumn("_port", F.explode(ports)).withColumn(
            "_port", F.col("_port").cast("int")
        )
        fields = [("ip_address", F.col("IP Address"))] + [
            f for f in fields if f[0] != "ip_address"
        ]
        return _to_long(exploded, spec, F.col("_port"), fields)
    raise ValueError(spec.shape)


def _blackbox(df: DataFrame) -> DataFrame:
    """4-way probe fan-out (O14, reference :243-314): one row → up to 4
    probe entries, each guarded by its own column; keys ip / ip:22 /
    ip:port / url; golden shape (no environment when the column is absent)."""
    has_env = False  # shipped workbooks omit Environment (golden has none)
    sub = df.filter(
        (F.col("icmp").cast("string").isin("True", "true", "TRUE", "1"))
        | (F.col("ssh-banner").cast("string").isin("True", "true", "TRUE", "1"))
        | F.col("TCP_Connect_Port").isNotNull()
        | F.col("h2xx_url").isNotNull()
    )
    ip = F.col("IP Address")
    probes = F.array(
        F.when(
            F.col("icmp").cast("string").isin("True", "true", "TRUE", "1"),
            F.struct(ip.alias("key"), F.lit("icmp").alias("module")),
        ),
        F.when(
            F.col("ssh-banner").cast("string").isin("True", "true", "TRUE", "1"),
            F.struct(F.concat_ws(":", ip, F.lit("22")).alias("key"), F.lit("ssh_banner").alias("module")),
        ),
        F.when(
            F.col("TCP_Connect_Port").isNotNull(),
            F.struct(
                F.concat_ws(":", ip, F.col("TCP_Connect_Port").cast("double").cast("int")).alias("key"),
                F.lit("tcp_connect").alias("module"),
            ),
        ),
        F.when(
            F.col("h2xx_url").isNotNull(),
            F.struct(F.col("h2xx_url").alias("key"), F.lit("http_2xx").alias("module")),
        ),
    )
    exploded = sub.select(
        F.col("FQDN").alias("hostname"),
        F.col("Location").alias("location"),
        F.col("Country").alias("country"),
        *(["Environment"] if has_env else []),
        F.explode(probes).alias("probe"),
    ).filter(F.col("probe").isNotNull())
    fields = [
        ("module", F.col("probe.module")),
        ("location", F.col("location")),
        ("country", F.col("country")),
    ]
    pairs = F.array(
        *[F.struct(F.lit(n).alias("field"), c.cast("string").alias("value")) for n, c in fields]
    )
    return exploded.select(
        F.lit("exporter_blackbox").alias("exporter"),
        "hostname",
        F.col("probe.key").alias("entry_key"),
        F.explode(pairs).alias("fv"),
    ).select("exporter", "hostname", "entry_key", "fv.field", "fv.value")


# --------------------------------------------------------------------------
# The full exporter catalog (SURVEY §2b). 'generic' = shape A w/ ssh creds.
# --------------------------------------------------------------------------

def _generic(name: str, **kw) -> Spec:
    return Spec(name=name, shape="flat", **kw)


EXPORTER_SPECS: dict[str, Spec] = {
    s.name: s
    for s in [
        # 13 generic app exporters (reference :23-84 → O23)
        *[_generic(n) for n in [
            "exporter_wfodb", "exporter_pc5", "exporter_ams", "exporter_mpp",
            "exporter_iq", "exporter_ipo", "exporter_aam", "exporter_voiceportal",
            "exporter_callback", "exporter_breeze", "exporter_cms", "exporter_sm",
            "exporter_aes",
        ]],
        # SNMP family
        Spec("exporter_aessnmp", ssh_creds=False, snmp="v2v3"),
        Spec("exporter_avayasbc", ssh_creds=False, snmp="v2v3"),
        Spec("exporter_gateway", shape="per_ip", ssh_creds=False, snmp="v2int", include_ip=False),
        Spec("exporter_network", ssh_creds=False, snmp="v3only"),
        Spec("exporter_aaep", ssh_creds=False, snmp="v2v3"),
        Spec("exporter_pfsense", ssh_creds=False, snmp="v2v3"),
        Spec("exporter_audiocodesbc", ssh_creds=False, snmp="v2v3"),
        Spec("exporter_drac", port=623, ssh_creds=False, snmp="v2int"),
        # OS exporters
        Spec("exporter_linux", hostname_col="Hostnames"),
        Spec("exporter_windows", hostname_col="FQDN", port=9182, ssh_creds=False),
        Spec("exporter_verint", hostname_col="FQDN", port=9182, ssh_creds=False),
        Spec("exporter_vmware", hostname_col="FQDN", port=9272, ssh_creds=True),
        # specials
        Spec("exporter_ssl", ssl_port_rule=True, ssh_creds=False),
        Spec("exporter_acm", type_case=True),
        Spec("exporter_tcti", shape="per_port", hostname_col="FQDN", ssh_creds=False),
        Spec("exporter_jmx", shape="per_port", hostname_col="FQDN", ssh_creds=False),
        Spec("exporter_kafka", ssh_creds=False, extra_fields={"kafka_port": 9092}),
        # weblm (reference :1040-1080, NameError-dead there): ONE hostname
        # (first row's FQDN), field values from the last row, full literal
        # field set including the tomcat data_path.
        Spec("exporter_weblm", shape="first_row", hostname_col="FQDN",
             ssh_creds=False, include_port=False,
             extra_exprs={
                 "username": lambda: F.coalesce(F.col("ssh_username"), F.lit("put your username here")),
                 "password": lambda: F.coalesce(F.col("ssh_password"), F.lit("put your password here")),
             },
             extra_fields={"data_path": "/opt/Avaya/tomcat/webapps/WebLM/data/"},
             field_order=("ip_address", "location", "country", "data_path",
                          "username", "password")),
        Spec("exporter_aic", ssh_creds=True),
        Spec("exporter_oceanamonitor", ssh_creds=False),
        # genesyscloud (reference :926-950): full literal field set in the
        # reference's insert order — extra_args preserved byte-exactly
        # INCLUDING its missing-space quirks (":937 '--billing.frequency30m',
        # '3.59999--mos.bandceilingwarning'").
        Spec("exporter_genesyscloud", hostname_col="FQDN", ssh_creds=False,
             extra_exprs={"community": lambda: F.coalesce(F.col("comm_string"), F.lit("public"))},
             extra_fields={
                 "extra_args": (
                     " --client.managed --billing.enabled --billing.frequency30m"
                     " --usage.enabled --usage.frequency12h --client.first-day-of-month22"
                     " --mos.enabled --mos.bandceilingcritical2.59999"
                     " --mos.bandceilingbad3.59999--mos.bandceilingwarning3.09999"
                     " --mos.bandceilinggood3.99999"
                 ),
                 "client_id": "ENC[PKCS7...]",
                 "client_secret": "ENC[PKCS7...]",
                 "client_basepath": "https://api.mypurecloud.ie",
             },
             field_order=("listen_port", "extra_args", "client_id",
                          "client_secret", "client_basepath", "ip_address",
                          "location", "country", "community")),
        # baas (reference :1495-1527): maas user + backup extra_args +
        # ssh_password-or-ENC + the literal s3 bucket placeholder.
        Spec("exporter_baas", hostname_col="FQDN", ssh_creds=False,
             extra_exprs={"password": lambda: F.coalesce(F.col("ssh_password"), F.lit("ENC"))},
             extra_fields={
                 "username": "maas",
                 "extra_args": " --backup.timeout=30s --backup.frequency=1m ",
                 "bucket": "s3://<s2bucket>",
             },
             field_order=("ip_address", "listen_port", "location", "country",
                          "username", "extra_args", "password", "bucket")),
        Spec("exporter_redis", ssh_creds=False,
             extra_fields={"debug": "True", "application": "Verint Mobile Gateway"}),
        # probe fan-out
        Spec("exporter_blackbox", shape="probes"),
    ]
}


def run_exporters(df: DataFrame, names: list[str] | None = None) -> DataFrame:
    """Dispatch (O24): run the selected exporters and union the long rows.

    'all' really means all (the reference's literal 21-name list at :1803
    omits 15 exporters and its `run_scripts` call is a NameError — computed
    here instead, per SURVEY Appendix A)."""
    names = names or sorted(EXPORTER_SPECS)
    parts = [run_exporter(df, EXPORTER_SPECS[n]) for n in names]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
