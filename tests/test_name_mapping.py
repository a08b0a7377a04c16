"""Iceberg NAME MAPPING (round 12 — spec §Name Mapping Serialization):
``schema.name-mapping.default`` resolves data files WITHOUT field ids
(Hive migrations, foreign writers) by mapped candidate names — the
spec's answer to the silent-null-after-rename hazard the field-id
fallback cannot cover."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _strip_parquet_fids(root):
    """Rewrite every data parquet without field-id metadata — simulating
    files a pre-Iceberg writer produced."""
    for f in glob.glob(os.path.join(root, "data", "*.parquet")):
        tbl = pq.read_table(f)
        bare = pa.schema(
            [pa.field(fld.name, fld.type) for fld in tbl.schema]
        )
        pq.write_table(tbl.cast(bare), f)


def _mk(spark, tmp_path):
    root = str(tmp_path / "t")
    iceberg.write_iceberg(
        spark,
        spark.range(8).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
    )
    return root


def test_mapping_survives_rename_on_fidless_files(spark, tmp_path):
    root = _mk(spark, tmp_path)
    _strip_parquet_fids(root)
    iceberg.set_iceberg_name_mapping(root)
    iceberg.rename_iceberg_column(root, "v", "speed")
    got = sorted((r.id, r.speed) for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [(i, i * 2) for i in range(8)]
    # WITHOUT the mapping the same files would name-resolve 'speed'
    # against footers carrying 'v' and silently null — prove the hazard
    meta = iceberg._load_metadata(root)
    props = dict(meta.get("properties") or {})
    props.pop("schema.name-mapping.default")
    meta["properties"] = props
    iceberg._swap_metadata(root, meta)
    nulls = iceberg.read_iceberg(spark, root).where("speed IS NULL").count()
    assert nulls == 8


def test_mapping_merges_old_names_across_renames(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.set_iceberg_name_mapping(root)
    iceberg.rename_iceberg_column(root, "v", "speed")
    # refresh AFTER the rename: 'speed' joins the candidates, 'v' stays
    iceberg.set_iceberg_name_mapping(root)
    meta = iceberg._load_metadata(root)
    nmap = iceberg._table_name_mapping(meta)
    fid = next(
        f["id"]
        for f in iceberg._current_schema(meta)["fields"]
        if f["name"] == "speed"
    )
    assert set(nmap[fid]) == {"v", "speed"}
    _strip_parquet_fids(root)
    got = sorted(
        (r.id, r.speed) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(i, i * 2) for i in range(8)]


def test_mapping_composes_with_defaults(spark, tmp_path):
    """A fid-less file missing a defaulted column: the mapping proves
    which fields the file DOES carry; the absent defaulted fid
    surfaces the constant, not null."""
    root = str(tmp_path / "t3")
    iceberg.write_iceberg(
        spark,
        spark.range(5).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=3,
    )
    _strip_parquet_fids(root)
    iceberg.set_iceberg_name_mapping(root)
    iceberg.add_iceberg_column(root, "chan", "string", default="legacy")
    got = {(r.id, r.chan) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {(i, "legacy") for i in range(5)}


def test_nested_mapping_entry_refuses(spark, tmp_path):
    root = _mk(spark, tmp_path)
    meta = iceberg._load_metadata(root)
    props = dict(meta.get("properties") or {})
    props["schema.name-mapping.default"] = json.dumps(
        [{"field-id": 1, "names": ["id"], "fields": [{"field-id": 9, "names": ["x"]}]}]
    )
    meta["properties"] = props
    iceberg._swap_metadata(root, meta)
    with pytest.raises(NotImplementedError, match="nested name-mapping"):
        iceberg.read_iceberg(spark, root).collect()


def test_mapping_on_orc_rowfmt_leg(spark, tmp_path):
    """The ORC scan leg resolves fid-less files through the mapping too
    (same contract as parquet) — rename included."""
    import pyarrow.orc as pa_orc

    root = str(tmp_path / "orc")
    iceberg.write_iceberg(
        spark,
        spark.range(6).select("id", (F.col("id") * 3).alias("v")),
        root,
        format_version=2,
        data_format="orc",
    )
    for f in glob.glob(os.path.join(root, "data", "*.orc")):
        tbl = pa_orc.ORCFile(f).read()
        bare = pa.schema(
            [pa.field(fld.name, fld.type) for fld in tbl.schema]
        )
        pa_orc.write_table(tbl.cast(bare), f)
    iceberg.set_iceberg_name_mapping(root)
    iceberg.rename_iceberg_column(root, "v", "speed")
    got = sorted(
        (r.id, r.speed) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(i, i * 3) for i in range(6)]
