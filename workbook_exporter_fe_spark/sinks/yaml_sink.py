"""YAML compat sink: the reference's ordered 2/3-level output document.

Closes SURVEY §2 O21 (ordered YAML document sink) and O22 (`add_snmp_args`
header prepend): the engine's long rows
``(exporter, hostname, entry_key, field, value)`` are assembled back into
the nested document the reference writes (write path
/root/reference/workbook_exporter-fe.py:1758-1778), with:

- **section → hostname → fields** for flat exporters and
  **section → hostname → entry_key → fields** for the 3-level shapes
  (blackbox probes, gateway per-ip, tcti/jmx per-port);
- field order per entry = the reference's insert order (``spec_field_order``
  — byte-level parity with the golden document is pinned by
  tests/test_yaml_sink.py for every self-consistent golden section);
- scalars re-typed the way the reference wrote them (ports/versions back to
  int, True/False back to bool, numeric entry keys back to int keys);
- hostname-level merge-update against an existing document (reference
  ``write_yaml`` :1758-1767: per-hostname last-write-wins);
- the optional ``trap_extra_args`` header line prepended verbatim
  (``add_snmp_args``, reference :1593-1618 — O22).

Assembly is driver-side by design: a config document is small (10³–10⁴
entries — it is the OUTPUT of the workbook pipeline, not data-plane rows),
exactly the "YAML compat-sink via driver-side collect" SURVEY §5 planned.
The distributed path stays the long form; this sink only renders it.
"""

from __future__ import annotations

import os
import re

import yaml

from pyspark.sql import DataFrame

from workbook_exporter_fe_spark.operators.workbook import (
    EXPORTER_SPECS,
    spec_field_order,
)

# O22 — the exact header line add_snmp_args prepends (reference :1607).
SNMP_ARGS_LINE = (
    'trap_extra_args: " --snmp.version 3 --snmp.username username'
    " --snmp.privacy-protocol aes --snmp.privacy-passphrase password"
    ' --snmp.auth-protocol sha --snmp.auth-passphrase password"'
)

_INT_RE = re.compile(r"^-?\d+$")


def _typed(value: str):
    """Re-type the long form's string value the way the reference wrote it:
    ints stay ints (listen_port/snmp_version), booleans stay booleans
    (redis debug=True), everything else is a plain string."""
    if value is None:
        return None
    if _INT_RE.match(value):
        return int(value)
    if value == "True":
        return True
    if value == "False":
        return False
    return value


def _key(entry_key: str):
    """Numeric entry keys (jmx/tcti ports) are int keys in the document."""
    return int(entry_key) if entry_key is not None and _INT_RE.match(entry_key) else entry_key


def to_yaml_document(long_rows: DataFrame, field_orders: dict[str, list[str]] | None = None) -> dict:
    """Long rows → the ordered nested document (plain dicts; python ≥3.7
    dicts preserve insertion order, which is what yaml.dump(sort_keys=False)
    emits — the modern spelling of the reference's OrderedDict representer
    :1772-1778).

    Hostnames (and entry keys) are emitted in sorted order — the
    deterministic analog of the reference's workbook-row order, which is
    not reproducible from a set of rows; fields are emitted in each
    exporter's reference insert order."""
    if field_orders is None:
        field_orders = {
            name: spec_field_order(spec) for name, spec in EXPORTER_SPECS.items()
        }
    collected = long_rows.select(
        "exporter", "hostname", "entry_key", "field", "value"
    ).collect()
    # exporter → hostname → entry_key(None for 2-level) → {field: value}
    tree: dict = {}
    for r in collected:
        tree.setdefault(r["exporter"], {}).setdefault(r["hostname"], {}).setdefault(
            r["entry_key"], {}
        )[r["field"]] = _typed(r["value"])
    doc: dict = {}
    for exporter in sorted(tree):
        order = field_orders.get(exporter, [])
        pos = {n: i for i, n in enumerate(order)}

        def entry(fields: dict) -> dict:
            names = sorted(fields, key=lambda n: (pos.get(n, len(pos)), n))
            return {n: fields[n] for n in names}

        sec: dict = {}
        for hostname in sorted(tree[exporter], key=str):
            ekeys = tree[exporter][hostname]
            if list(ekeys) == [None]:  # 2-level section
                sec[hostname] = entry(ekeys[None])
            else:  # 3-level section
                sec[hostname] = {
                    _key(k): entry(ekeys[k]) for k in sorted(ekeys, key=str)
                }
        doc[exporter] = sec
    return doc


def merge_documents(existing: dict, new: dict) -> dict:
    """Reference write_yaml merge (:1758-1767): section-wise, hostname-level
    last-write-wins update of the existing document."""
    for section, hosts in new.items():
        existing.setdefault(section, {}).update(hosts)
    return existing


def dump_yaml(doc: dict, snmp_args: bool = False) -> str:
    """Render the ordered document; optionally prepend the O22 header."""
    text = yaml.dump(doc, allow_unicode=True, sort_keys=False, default_flow_style=False)
    if snmp_args:
        text = SNMP_ARGS_LINE + "\n" + text
    return text


def write_yaml_document(
    long_rows: DataFrame, path: str, merge_existing: bool = True,
    snmp_args: bool | None = None,
) -> str:
    """End-to-end sink: long rows → (merged) document → file. Returns the
    rendered text. Re-running with the same rows is idempotent (hostname-
    level upsert, same render).

    ``snmp_args``: True prepends the O22 header, False drops any existing
    one, None (default) PRESERVES a header already present in the merged
    document — re-running exporters must not silently strip a previously
    added trap_extra_args line."""
    doc = to_yaml_document(long_rows)
    had_header = False
    if merge_existing and os.path.exists(path):
        with open(path, encoding="utf8") as f:
            raw = f.read()
        # an existing O22 header is not part of the document body
        if raw.startswith("trap_extra_args:"):
            had_header = True
            raw = raw.split("\n", 1)[1] if "\n" in raw else ""
        existing = yaml.safe_load(raw) or {}
        doc = merge_documents(existing, doc)
    with_header = had_header if snmp_args is None else snmp_args
    text = dump_yaml(doc, snmp_args=with_header)
    with open(path, "w", encoding="utf8") as f:
        f.write(text)
    return text
