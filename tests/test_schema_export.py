"""Table-contract interchange: Arrow ⇄ BigQuery JSON / Avro round-trips,
proto2 emission, and live-lake evolved-schema publication.

Reference analog: the contract is versioned in three parallel formats —
``schemas/proto/*.proto``, ``schemas/bq/*.json``, ``schemas/avro/*`` —
kept in sync by codegen (``sonic_config/build_proto.rs:217-323``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from sonic_etl_ray.schemas import CHANGE_EVENT_SCHEMA, STATE_SCHEMA
from sonic_etl_ray.schemas_export import (
    arrow_to_avro,
    arrow_to_bq_json,
    arrow_to_proto2,
    avro_to_arrow,
    bq_json_to_arrow,
    engine_table_schemas,
    export_table_contracts,
    lake_state_schema,
)

NESTED = pa.schema(
    [
        pa.field("id", pa.int64(), nullable=False),
        pa.field("tags", pa.list_(pa.string())),
        pa.field(
            "withdrawals",
            pa.list_(
                pa.struct(
                    [pa.field("index", pa.int64()), pa.field("amount", pa.float64())]
                )
            ),
        ),
        pa.field("meta", pa.struct([pa.field("lang", pa.string())])),
    ]
)


def test_bq_json_roundtrip_state_schema():
    bq = arrow_to_bq_json(STATE_SCHEMA)
    # BQ JSON is the reference's authoritative column-type format
    assert {f["name"] for f in bq} == set(STATE_SCHEMA.names)
    assert next(f for f in bq if f["name"] == "repo")["mode"] == "REQUIRED"
    assert next(f for f in bq if f["name"] == "size_bytes")["type"] == "INTEGER"
    back = bq_json_to_arrow(bq)
    assert back.names == STATE_SCHEMA.names
    # int64/string/bool survive exactly; nullability survives exactly
    for f in STATE_SCHEMA:
        assert back.field(f.name).nullable == f.nullable
        assert back.field(f.name).type == f.type


def test_bq_json_nested_repeated_record():
    bq = arrow_to_bq_json(NESTED)
    w = next(f for f in bq if f["name"] == "withdrawals")
    assert (w["type"], w["mode"]) == ("RECORD", "REPEATED")
    assert {c["name"] for c in w["fields"]} == {"index", "amount"}
    back = bq_json_to_arrow(bq)
    assert pa.types.is_list(back.field("withdrawals").type)
    assert pa.types.is_struct(back.field("withdrawals").type.value_type)


def test_avro_roundtrip_exact():
    for schema in (STATE_SCHEMA, CHANGE_EVENT_SCHEMA, NESTED):
        av = arrow_to_avro(schema, "t")
        json.dumps(av)  # must be valid JSON
        back = avro_to_arrow(av)
        assert back.names == schema.names
        for f in schema:
            assert back.field(f.name).nullable == f.nullable
    # nullable columns are ["null", T] unions with null defaults
    av = arrow_to_avro(STATE_SCHEMA, "files_state")
    lang = next(f for f in av["fields"] if f["name"] == "lang")
    assert lang["type"][0] == "null" and lang["default"] is None


def test_proto2_emission():
    txt = arrow_to_proto2(STATE_SCHEMA, "FilesState")
    assert 'syntax = "proto2";' in txt
    assert "required string repo = 1;" in txt
    assert "optional int64 size_bytes" in txt and "(BQ->INTEGER)" in txt
    assert txt.count("{") == txt.count("}") == 1  # syntactically closed
    nested = arrow_to_proto2(NESTED, "Block")
    assert "repeated Block_Withdrawals withdrawals" in nested
    assert "message Block_Withdrawals" in nested
    assert nested.count("{") == nested.count("}") == 3  # all messages closed
    # date32 maps (int32 + BQ DATE comment) instead of KeyError
    d = arrow_to_proto2(pa.schema([pa.field("d", pa.date32())]), "D")
    assert "optional int32 d = 1;  // (BQ->DATE)" in d


def test_export_writes_three_formats(tmp_path):
    out = export_table_contracts(str(tmp_path))
    assert set(out) == set(engine_table_schemas())
    for name, paths in out.items():
        assert [os.path.basename(os.path.dirname(p)) for p in paths] == [
            "bq", "avro", "proto",
        ]
        for p in paths:
            assert os.path.getsize(p) > 0
    with open(os.path.join(tmp_path, "bq", "files_state.json")) as fh:
        assert bq_json_to_arrow(json.load(fh)).names == STATE_SCHEMA.names


def test_lake_state_schema_tracks_evolution(tmp_path):
    """A lake whose stream evolved (size_hint added) publishes the EVOLVED
    contract — read from commit records alone, no data scan."""
    from sonic_etl_ray.generator import StreamSpec, generate_stream
    from sonic_etl_ray.pipelines.ingest import run_ingest, scratch_lake_dir

    seg = str(tmp_path / "segs")
    files = generate_stream(
        seg, StreamSpec(n_events=600, n_repos=4, seed=5, segment_size=200, evolve_at=(200, 400))
    )
    lake = scratch_lake_dir("contract")
    run_ingest(files, lake, num_partitions=2, segments_per_epoch=1)
    schema = lake_state_schema(lake)
    assert "size_hint" in schema.names  # evolved column is in the contract
    assert set(STATE_SCHEMA.names) <= set(schema.names)
    out = export_table_contracts(str(tmp_path / "pub"), lake_dir=lake)
    assert "files_state_current" in out
    with open(out["files_state_current"][0]) as fh:
        names = {f["name"] for f in json.load(fh)}
    assert "size_hint" in names
