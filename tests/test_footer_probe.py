"""Distributed footer fid-map probe (round 14, VERDICT r13 item 1):
io/lakehouse._footer_fid_maps runs the per-file footer probe as one
Arrow-batched Spark job above DISTRIBUTED_FOOTER_THRESHOLD files — the
scan path's last O(#files) sequential driver loop. The job and the
driver loop share one per-file function (_footer_fid_map), and these
tests pin their agreement on randomized schemas (stamped / unstamped /
nested / unreadable-variant footers) plus the grouping semantics."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feature_store_ml_spark.io.lakehouse import (
    _footer_fid_map,
    _footer_fid_maps,
    _footer_probe_one,
    _group_files_by_field_ids,
)

_TYPES = [pa.int64(), pa.string(), pa.float64()]


def _field(name, ty, fid):
    md = {b"PARQUET:field_id": str(fid).encode()} if fid is not None else None
    return pa.field(name, ty, metadata=md)


_col = st.tuples(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    st.integers(0, len(_TYPES) - 1),
    st.one_of(st.none(), st.integers(1, 50)),
    st.booleans(),  # wrap in a struct (with one stamped member)?
)


def _mk_schema(cols):
    fields, used = [], set()
    for name, ti, fid, nest in cols:
        if name in used:
            continue
        used.add(name)
        if nest:
            inner = _field(
                "m", _TYPES[ti], None if fid is None else fid + 100
            )
            fields.append(
                _field(name, pa.struct([inner]), fid)
            )
        else:
            fields.append(_field(name, _TYPES[ti], fid))
    return pa.schema(fields)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.lists(_col, min_size=1, max_size=4), min_size=1, max_size=3))
def test_job_agrees_with_driver_loop(spark, tmp_path_factory, per_file):
    d = tmp_path_factory.mktemp("probe")
    files = []
    for i, cols in enumerate(per_file):
        sch = _mk_schema(cols)
        t = pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in sch], schema=sch
        )
        f = str(d / f"f{i}.parquet")
        pq.write_table(t, f)
        files.append(f)
    for nested in (False, True):
        drv = {f: _footer_fid_map(f, nested) for f in files}
        job = _footer_fid_maps(files, spark=spark, nested=nested, threshold=0)
        assert job == drv


def test_variant_footer_maps_to_none_both_paths(spark, tmp_path):
    d = str(tmp_path / "v")
    spark.range(3).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    ).repartition(1).write.parquet(d)
    vf = glob.glob(os.path.join(d, "*.parquet"))[0]
    flat = str(tmp_path / "flat.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1, 2], type=pa.int64())}), flat
    )
    files = [vf, flat]
    drv = {f: _footer_fid_map(f) for f in files}
    job = _footer_fid_maps(files, spark=spark, threshold=0)
    assert drv == job
    assert drv[vf] is None  # pyarrow cannot parse VARIANT footers
    # grouping: the unreadable footer lands in the unstamped group
    groups = _group_files_by_field_ids(files, spark=spark, threshold=0)
    by_key = {tuple(sorted(m.items())): set(fs) for m, fs in groups}
    assert set(by_key[()]) == {vf, flat}


def test_grouping_identical_across_paths(spark, tmp_path):
    files = []
    for i in range(6):
        fid = 1 if i < 3 else 2  # two distinct fid maps
        sch = pa.schema([_field("k", pa.int64(), fid)])
        f = str(tmp_path / f"g{i}.parquet")
        pq.write_table(
            pa.Table.from_arrays([pa.array([i])], schema=sch), f
        )
        files.append(f)
    g_drv = _group_files_by_field_ids(files)
    g_job = _group_files_by_field_ids(files, spark=spark, threshold=0)
    canon = lambda gs: sorted(  # noqa: E731
        (tuple(sorted(m.items())), tuple(sorted(fs))) for m, fs in gs
    )
    assert canon(g_drv) == canon(g_job)


def test_threshold_dispatch(spark, tmp_path, monkeypatch):
    """Below the threshold no job is launched (createDataFrame spy)."""
    f = str(tmp_path / "one.parquet")
    pq.write_table(pa.table({"k": [1]}), f)
    calls = []
    orig = type(spark).createDataFrame

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", spy)
    _footer_fid_maps([f], spark=spark)  # 1 file << threshold
    assert not calls
    _footer_fid_maps([f], spark=spark, threshold=0)
    assert calls


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.lists(_col, min_size=1, max_size=4), min_size=1, max_size=3))
def test_with_names_job_agrees_with_driver_loop(
    spark, tmp_path_factory, per_file
):
    """with_names=True returns (fid map, top-level names) from ONE footer
    read, identically on the driver loop and the distributed job — the
    contract streaming's _footers_mismatch_schema relies on to avoid a
    second serial per-file read."""
    d = tmp_path_factory.mktemp("probe_names")
    files = []
    for i, cols in enumerate(per_file):
        sch = _mk_schema(cols)
        t = pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in sch], schema=sch
        )
        f = str(d / f"f{i}.parquet")
        pq.write_table(t, f)
        files.append(f)
    drv = {f: _footer_probe_one(f) for f in files}
    job = _footer_fid_maps(files, spark=spark, threshold=0, with_names=True)
    assert job == drv
    for f in files:
        fids, names = drv[f]
        assert names == pq.read_schema(f).names
        assert fids == _footer_fid_map(f)


def test_with_names_variant_footer_is_none_none(spark, tmp_path):
    d = str(tmp_path / "vn")
    spark.range(3).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    ).repartition(1).write.parquet(d)
    vf = glob.glob(os.path.join(d, "*.parquet"))[0]
    assert _footer_probe_one(vf) == (None, None)
    job = _footer_fid_maps([vf], spark=spark, threshold=0, with_names=True)
    assert job[vf] == (None, None)
