"""Table-contract interchange: publish the engine's Arrow schemas to
non-Arrow consumers.

The reference versions every output table's schema in THREE parallel
formats — proto2 (``schemas/proto/*.proto``), BigQuery JSON
(``schemas/bq/*.json``) and Avro (``schemas/avro/*``) — so downstream
warehouses, stream consumers and codegen all share one contract
(``sonic_config/build_proto.rs:217-323`` compiles them together). This
engine's native contract is a ``pyarrow.Schema`` per table; this module
emits (and re-imports) the same three interchange formats from it, plus a
one-call ``export_table_contracts`` that publishes every engine table —
including a LIVE lake's current evolved state schema, read from the commit
log alone (schema evolution means the published contract must track the
lake, not the static constant).

Pure metadata — no Ray, no data reads; the export is a handful of small
files. Type mappings are the public BigQuery / Avro / proto2 ones.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa

# ------------------------------------------------------------ BigQuery JSON

_BQ_TYPE = {
    "string": "STRING",
    "large_string": "STRING",
    "bool": "BOOLEAN",
    "int8": "INTEGER",
    "int16": "INTEGER",
    "int32": "INTEGER",
    "int64": "INTEGER",
    "uint8": "INTEGER",
    "uint16": "INTEGER",
    "uint32": "INTEGER",
    "float": "FLOAT",
    "double": "FLOAT",
    "halffloat": "FLOAT",
    "binary": "BYTES",
    "large_binary": "BYTES",
    "date32[day]": "DATE",
}


def _bq_field(f: pa.Field) -> dict[str, Any]:
    t = f.type
    mode = "NULLABLE" if f.nullable else "REQUIRED"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        inner = _bq_field(pa.field(f.name, t.value_type, nullable=True))
        inner["mode"] = "REPEATED"  # BQ arrays: REPEATED on the element type
        return inner
    if pa.types.is_struct(t):
        return {
            "name": f.name,
            "type": "RECORD",
            "mode": mode,
            "fields": [_bq_field(c) for c in t],
        }
    if pa.types.is_timestamp(t):
        return {"name": f.name, "type": "TIMESTAMP", "mode": mode}
    if pa.types.is_decimal(t):
        return {"name": f.name, "type": "NUMERIC", "mode": mode}
    key = str(t)
    if key not in _BQ_TYPE:
        raise TypeError(f"no BigQuery mapping for Arrow type {t} (field {f.name!r})")
    return {"name": f.name, "type": _BQ_TYPE[key], "mode": mode}


def arrow_to_bq_json(schema: pa.Schema) -> list[dict[str, Any]]:
    """Arrow schema → BigQuery JSON schema (the ``schemas/bq/*.json``
    format: list of {name, type, mode[, fields]})."""
    return [_bq_field(f) for f in schema]


_BQ_TO_ARROW = {
    "STRING": pa.string(),
    "BOOLEAN": pa.bool_(),
    "INTEGER": pa.int64(),
    "FLOAT": pa.float64(),
    "BYTES": pa.binary(),
    "DATE": pa.date32(),
    "TIMESTAMP": pa.timestamp("us", tz="UTC"),
    "NUMERIC": pa.decimal128(38, 9),
}


def _bq_to_arrow_field(d: dict[str, Any]) -> pa.Field:
    mode = d.get("mode", "NULLABLE")
    if d["type"] == "RECORD":
        t: pa.DataType = pa.struct([_bq_to_arrow_field(c) for c in d["fields"]])
    else:
        t = _BQ_TO_ARROW[d["type"]]
    if mode == "REPEATED":
        return pa.field(d["name"], pa.list_(t), nullable=True)
    return pa.field(d["name"], t, nullable=(mode != "REQUIRED"))


def bq_json_to_arrow(fields: list[dict[str, Any]]) -> pa.Schema:
    """BigQuery JSON schema → Arrow schema (lossy where BQ is coarser than
    Arrow: every INTEGER comes back int64, FLOAT comes back float64 — the
    same widths the engine's widen rules evolve toward)."""
    return pa.schema([_bq_to_arrow_field(d) for d in fields])


# ------------------------------------------------------------------- Avro

_AVRO_TYPE = {
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "int8": "int",
    "int16": "int",
    "int32": "int",
    "int64": "long",
    "uint8": "int",
    "uint16": "int",
    "uint32": "long",
    "float": "float",
    "double": "double",
    "halffloat": "float",
    "binary": "bytes",
    "large_binary": "bytes",
}


def _avro_type(t: pa.DataType, name_hint: str) -> Any:
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "items": _avro_type(t.value_type, name_hint)}
    if pa.types.is_struct(t):
        return {
            "type": "record",
            "name": f"{name_hint}_record",
            "fields": [_avro_field(c, name_hint=f"{name_hint}_{c.name}") for c in t],
        }
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if pa.types.is_date32(t):
        return {"type": "int", "logicalType": "date"}
    if pa.types.is_decimal(t):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": t.precision,
            "scale": t.scale,
        }
    key = str(t)
    if key not in _AVRO_TYPE:
        raise TypeError(f"no Avro mapping for Arrow type {t}")
    return _AVRO_TYPE[key]


def _avro_field(f: pa.Field, name_hint: str | None = None) -> dict[str, Any]:
    t = _avro_type(f.type, name_hint or f.name)
    if f.nullable:
        t = ["null", t]
    out: dict[str, Any] = {"name": f.name, "type": t}
    if f.nullable:
        out["default"] = None
    return out


def arrow_to_avro(schema: pa.Schema, name: str) -> dict[str, Any]:
    """Arrow schema → Avro record schema (the ``schemas/avro/*`` format);
    nullable columns become ``["null", T]`` unions with null defaults."""
    return {
        "type": "record",
        "name": name,
        "fields": [_avro_field(f) for f in schema],
    }


_AVRO_TO_ARROW = {
    "string": pa.string(),
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bytes": pa.binary(),
}


def _avro_to_arrow_type(t: Any) -> pa.DataType:
    if isinstance(t, str):
        return _AVRO_TO_ARROW[t]
    if isinstance(t, list):  # union — only ["null", T] is emitted/accepted
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise TypeError(f"unsupported Avro union {t}")
        return _avro_to_arrow_type(non_null[0])
    lt = t.get("logicalType")
    if lt == "timestamp-micros":
        return pa.timestamp("us", tz="UTC")
    if lt == "date":
        return pa.date32()
    if lt == "decimal":
        return pa.decimal128(t["precision"], t["scale"])
    if t["type"] == "array":
        return pa.list_(_avro_to_arrow_type(t["items"]))
    if t["type"] == "record":
        return pa.struct(
            [
                pa.field(
                    f["name"],
                    _avro_to_arrow_type(f["type"]),
                    nullable=isinstance(f["type"], list) and "null" in f["type"],
                )
                for f in t["fields"]
            ]
        )
    return _avro_to_arrow_type(t["type"])


def avro_to_arrow(av: dict[str, Any]) -> pa.Schema:
    """Avro record schema → Arrow schema."""
    return pa.schema(
        [
            pa.field(
                f["name"],
                _avro_to_arrow_type(f["type"]),
                nullable=isinstance(f["type"], list) and "null" in f["type"],
            )
            for f in av["fields"]
        ]
    )


# ------------------------------------------------------------------ proto2

_PROTO_TYPE = {
    "string": "string",
    "large_string": "string",
    "bool": "bool",
    "int8": "int32",
    "int16": "int32",
    "int32": "int32",
    "int64": "int64",
    "uint8": "uint32",
    "uint16": "uint32",
    "uint32": "uint32",
    "uint64": "uint64",
    "float": "float",
    "double": "double",
    "binary": "bytes",
    "large_binary": "bytes",
}


def arrow_to_proto2(schema: pa.Schema, message: str, package: str = "etl") -> str:
    """Arrow schema → a proto2 message definition (text). Nested structs
    become nested messages; lists become ``repeated``; every scalar carries
    a ``(BQ->Type)`` comment like the reference's
    ``schemas/proto/blocks.proto:9-27`` convention so the three published
    formats stay visibly in sync."""
    lines = ['syntax = "proto2";', "", f"package {package};", ""]
    lines += _proto_message(schema, message)
    return "\n".join(lines) + "\n"


def _proto_message(fields: pa.Schema | pa.StructType, name: str, indent: str = "") -> list[str]:
    header = f"{indent}message {name} {{"
    nested: list[str] = []
    body: list[str] = []
    n = 0
    for f in fields:
        n += 1
        t = f.type
        label = "optional" if f.nullable else "required"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            label, t = "repeated", t.value_type
        if pa.types.is_struct(t):
            sub = f"{name}_{f.name.capitalize()}"
            nested += _proto_message(t, sub, indent + "  ")
            body.append(f"{indent}  {label} {sub} {f.name} = {n};")
            continue
        if pa.types.is_timestamp(t):
            pt, bq = "int64", "TIMESTAMP"
        elif pa.types.is_decimal(t):
            pt, bq = "string", "NUMERIC"
        elif pa.types.is_date32(t):
            pt, bq = "int32", "DATE"
        else:
            if str(t) not in _PROTO_TYPE:
                raise TypeError(f"no proto2 mapping for Arrow type {t} (field {f.name!r})")
            pt = _PROTO_TYPE[str(t)]
            bq = _bq_field(pa.field(f.name, t, nullable=True))["type"]
        body.append(f"{indent}  {label} {pt} {f.name} = {n};  // (BQ->{bq})")
    return [header] + nested + body + [f"{indent}}}"]


# ------------------------------------------------------------ publication


def engine_table_schemas() -> dict[str, pa.Schema]:
    """Every contract the engine owns, by table name."""
    from .pipelines.ingest import COMMIT_RECORD_SCHEMA, _feed_schema
    from .schemas import CHANGE_EVENT_SCHEMA, STATE_SCHEMA

    return {
        "change_events": CHANGE_EVENT_SCHEMA,
        "files_state": STATE_SCHEMA,
        "change_feed": _feed_schema(),
        "commit_records": COMMIT_RECORD_SCHEMA,
    }


def lake_state_schema(lake_dir: str) -> pa.Schema:
    """The lake's CURRENT evolved state schema, reconstructed from commit
    records alone (no data reads — the same source ``schema_history``
    audits): the running union of every committed partition schema, with
    later types superseding earlier (the widen path records the post-merge
    type)."""
    from .state import commitlog as cl

    seen: dict[str, str] = {}
    for e in cl.committed_epochs(lake_dir):
        m = cl.read_manifest(lake_dir, e) or {}
        for p in m.get("parts", []):
            rec = cl.read_commit(lake_dir, e, int(p)) or {}
            seen.update(rec.get("schema") or {})
    if not seen:
        from .schemas import STATE_SCHEMA

        return STATE_SCHEMA
    base = {f.name: f for f in engine_table_schemas()["files_state"]}
    fields = []
    for name, typ in seen.items():
        if name in base and str(base[name].type) == typ:
            fields.append(base[name])  # keep nullability of the constant
        else:
            fields.append(pa.field(name, _parse_arrow_type(typ), nullable=True))
    return pa.schema(fields)


_PARSE = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "binary": pa.binary(),
}


def _parse_arrow_type(s: str) -> pa.DataType:
    if s in _PARSE:
        return _PARSE[s]
    if s.startswith("list<item: ") and s.endswith(">"):
        return pa.list_(_parse_arrow_type(s[len("list<item: "):-1]))
    if s.startswith("timestamp"):
        return pa.timestamp("us", tz="UTC")
    raise TypeError(f"cannot parse Arrow type string {s!r}")


def export_table_contracts(
    out_dir: str,
    lake_dir: str | None = None,
    tables: dict[str, pa.Schema] | None = None,
) -> dict[str, list[str]]:
    """Publish every table contract as ``bq/<t>.json`` + ``avro/<t>.avsc``
    + ``proto/<t>.proto`` under ``out_dir`` (the reference's three-format
    layout). With ``lake_dir``, the live lake's evolved state schema is
    published as ``files_state_current`` alongside the static contracts.
    Returns {table: [paths]}."""
    tables = dict(tables or engine_table_schemas())
    if lake_dir is not None:
        tables["files_state_current"] = lake_state_schema(lake_dir)
    written: dict[str, list[str]] = {}
    for sub in ("bq", "avro", "proto"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for name, schema in tables.items():
        # render all three BEFORE writing any, so an unmappable type raises
        # without leaving a partially-published contract for this table
        payloads = [
            ("bq", f"{name}.json", json.dumps(arrow_to_bq_json(schema), indent=2)),
            ("avro", f"{name}.avsc", json.dumps(arrow_to_avro(schema, name), indent=2)),
            ("proto", f"{name}.proto", arrow_to_proto2(schema, _camel(name))),
        ]
        paths = []
        for sub, fname, text in payloads:
            p = os.path.join(out_dir, sub, fname)
            with open(p, "w") as fh:
                fh.write(text)
            paths.append(p)
        written[name] = paths
    return written


def _camel(s: str) -> str:
    return "".join(w.capitalize() for w in s.split("_"))
