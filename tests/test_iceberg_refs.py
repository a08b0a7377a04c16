"""Iceberg REFS (spec §Refs): named tags/branches pinning snapshots,
protected from expiration — the reproducible-training-set mechanism
("read the v2024.08 tag" months after retention would have dropped it)."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _append(spark, root, lo, hi):
    iceberg.write_iceberg(
        spark,
        spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
    )


def test_tag_pins_snapshot_across_appends(spark, tmp_path):
    root = str(tmp_path / "t")
    _append(spark, root, 0, 10)
    sid = iceberg.set_iceberg_ref(root, "v1")
    _append(spark, root, 10, 20)
    _append(spark, root, 20, 30)
    # refs survive appends (the metadata rebuild must carry them)
    assert iceberg.read_iceberg(spark, root, ref="v1").count() == 10
    assert iceberg.read_iceberg(spark, root).count() == 30
    assert sid == iceberg.resolve_iceberg_ref(iceberg._load_metadata(root), "v1")


def test_properties_survive_appends(spark, tmp_path):
    """Regression: the append path rebuilt metadata with properties={},
    silently resetting table config."""
    root = str(tmp_path / "p")
    _append(spark, root, 0, 5)
    meta = dict(iceberg._load_metadata(root))
    meta["properties"] = {"commit.retry.num-retries": "7"}
    iceberg._swap_metadata(root, meta)
    _append(spark, root, 5, 10)
    assert iceberg._load_metadata(root)["properties"] == {
        "commit.retry.num-retries": "7"
    }


def test_refs_protect_from_expiration(spark, tmp_path):
    root = str(tmp_path / "e")
    _append(spark, root, 0, 10)
    iceberg.set_iceberg_ref(root, "keepme")
    _append(spark, root, 10, 20)
    _append(spark, root, 20, 30)
    out = iceberg.expire_iceberg_snapshots(root, keep=1)
    # the tagged snapshot (oldest) survived; the middle one expired
    assert len(out["snapshots"]) == 1
    assert iceberg.read_iceberg(spark, root, ref="keepme").count() == 10
    # drop the ref -> the snapshot becomes expirable
    iceberg.drop_iceberg_ref(root, "keepme")
    out2 = iceberg.expire_iceberg_snapshots(root, keep=1)
    assert len(out2["snapshots"]) == 1
    with pytest.raises(ValueError, match="unknown ref"):
        iceberg.read_iceberg(spark, root, ref="keepme")


def test_branch_moves_and_refusals(spark, tmp_path):
    root = str(tmp_path / "b")
    _append(spark, root, 0, 10)
    iceberg.set_iceberg_ref(root, "dev", ref_type="branch")
    _append(spark, root, 10, 20)
    assert iceberg.read_iceberg(spark, root, ref="dev").count() == 10
    iceberg.set_iceberg_ref(root, "dev", ref_type="branch")  # move to head
    assert iceberg.read_iceberg(spark, root, ref="dev").count() == 20
    with pytest.raises(ValueError, match="tag|branch"):
        iceberg.set_iceberg_ref(root, "x", ref_type="bogus")
    with pytest.raises(ValueError, match="does not exist"):
        iceberg.set_iceberg_ref(root, "x", snapshot_id=999999)
    with pytest.raises(ValueError, match="no ref"):
        iceberg.drop_iceberg_ref(root, "nope")
    with pytest.raises(ValueError, match="not both"):
        iceberg.read_iceberg(spark, root, ref="dev", snapshot_id=1)


def test_ref_composes_with_mutations(spark, tmp_path):
    """Tag, then DELETE and UPDATE move the table on — the tag still reads
    the pre-mutation state (snapshots are immutable)."""
    root = str(tmp_path / "m")
    _append(spark, root, 0, 10)
    iceberg.set_iceberg_ref(root, "before")
    iceberg.delete_iceberg(spark, root, "id = 3")
    iceberg.update_iceberg(spark, root, {"v": "v + 1"}, where="id = 4")
    assert iceberg.read_iceberg(spark, root).count() == 9
    tagged = iceberg.read_iceberg(spark, root, ref="before")
    assert tagged.count() == 10
    assert tagged.where("id = 4").collect()[0].v == 8


def _append_branch(spark, root, lo, hi, branch):
    iceberg.write_iceberg(
        spark,
        spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
        branch=branch,
    )


def test_write_audit_publish(spark, tmp_path):
    """WAP: branch writes parent off the branch head and move only the
    branch pointer; fast-forward publishes when (and only when) main is
    an ancestor of the audit head."""
    root = str(tmp_path / "wap")
    _append(spark, root, 0, 50)
    iceberg.set_iceberg_ref(root, "audit", ref_type="branch")
    _append_branch(spark, root, 50, 80, "audit")
    _append_branch(spark, root, 80, 90, "audit")  # commits stack
    # main untouched, audit sees staged rows
    assert iceberg.read_iceberg(spark, root).count() == 50
    assert iceberg.read_iceberg(spark, root, ref="audit").count() == 90
    # main's snapshot-log gained nothing: timestamp travel cannot land on
    # an unpublished snapshot
    meta = iceberg._load_metadata(root)
    assert len(meta["snapshot-log"]) == 1
    head = iceberg.fast_forward_iceberg(root, "main", "audit")
    assert iceberg.read_iceberg(spark, root).count() == 90
    assert iceberg.fast_forward_iceberg(root, "main", "audit") == head  # no-op
    meta2 = iceberg._load_metadata(root)
    assert meta2["snapshot-log"][-1]["snapshot-id"] == head
    # branch->branch fast-forward too
    iceberg.set_iceberg_ref(root, "stale", snapshot_id=head, ref_type="branch")
    _append_branch(spark, root, 90, 95, "audit")
    assert iceberg.fast_forward_iceberg(root, "stale", "audit") == (
        iceberg.resolve_iceberg_ref(iceberg._load_metadata(root), "audit")
    )


def test_wap_divergence_and_refusals(spark, tmp_path):
    root = str(tmp_path / "div")
    _append(spark, root, 0, 10)
    iceberg.set_iceberg_ref(root, "audit", ref_type="branch")
    # main and the branch advance independently -> diverged -> refuse
    _append(spark, root, 10, 20)
    _append_branch(spark, root, 20, 30, "audit")
    with pytest.raises(ValueError, match="diverged"):
        iceberg.fast_forward_iceberg(root, "main", "audit")
    # tags are immutable on both the write and the fast-forward side
    iceberg.set_iceberg_ref(root, "pin", ref_type="tag")
    with pytest.raises(ValueError, match="TAG"):
        _append_branch(spark, root, 0, 1, "pin")
    with pytest.raises(ValueError, match="TAG"):
        iceberg.fast_forward_iceberg(root, "pin", "audit")
    # unknown branch / create-through-branch / literal-main refuse
    with pytest.raises(ValueError, match="no branch"):
        _append_branch(spark, root, 0, 1, "nope")
    with pytest.raises(ValueError, match="table head"):
        _append_branch(spark, root, 0, 1, "main")
    with pytest.raises(ValueError, match="non-existent"):
        _append_branch(spark, str(tmp_path / "fresh"), 0, 1, "audit")
    # schema evolution through a side branch refuses
    with pytest.raises(NotImplementedError, match="schema"):
        iceberg.write_iceberg(
            spark,
            spark.range(0, 1).select(
                "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("extra")
            ),
            root,
            format_version=2,
            branch="audit",
            merge_schema=True,
        )


def test_expire_protects_unpublished_branch_chain(spark, tmp_path):
    """Expiration keeps a branch's UNPUBLISHED ancestor chain alive (the
    parent walk fast-forward needs), while shared main history expires
    under the normal policy; dropping the ref releases the chain."""
    root = str(tmp_path / "exp")
    _append(spark, root, 0, 10)        # main s1
    _append(spark, root, 10, 20)       # main s2
    iceberg.set_iceberg_ref(root, "audit", ref_type="branch")
    _append_branch(spark, root, 20, 30, "audit")   # branch s3
    _append_branch(spark, root, 30, 40, "audit")   # branch s4 (head)
    _append(spark, root, 40, 50)       # main s5
    gone = iceberg.expire_iceberg_snapshots(root, keep=1)
    # both branch commits survive (head is ref'd; s3 is its unpublished
    # ancestor); at least one old main-only snapshot expired
    assert gone["snapshots"]
    assert iceberg.read_iceberg(spark, root, ref="audit").count() == 40
    assert iceberg.read_iceberg(spark, root).count() == 30
    # publish still impossible only because of genuine divergence (main
    # advanced) — ancestry data itself is intact
    with pytest.raises(ValueError, match="diverged"):
        iceberg.fast_forward_iceberg(root, "main", "audit")
    # drop the ref: the chain becomes expirable
    iceberg.drop_iceberg_ref(root, "audit")
    gone2 = iceberg.expire_iceberg_snapshots(root, keep=1)
    assert len(gone2["snapshots"]) >= 2
    assert iceberg.read_iceberg(spark, root).count() == 30


def test_max_ref_age_mixed_refs_expire_on_schedule(spark, tmp_path):
    """Per-ref retention (spec max-ref-age-ms, round 8): at expiration
    time an AGED ref drops and its snapshot falls under the normal
    policy; a young-capped ref, an uncapped tag and main all keep
    protecting theirs."""
    root = str(tmp_path / "age")
    _append(spark, root, 0, 10)      # snap A
    sid_a = iceberg._load_metadata(root)["current-snapshot-id"]
    _append(spark, root, 10, 20)     # snap B
    sid_b = iceberg._load_metadata(root)["current-snapshot-id"]
    _append(spark, root, 20, 30)     # snap C
    sid_c = iceberg._load_metadata(root)["current-snapshot-id"]
    _append(spark, root, 30, 40)     # snap D (head)
    # aged: snapshot A is seconds old, cap 1 ms → ref expires
    iceberg.set_iceberg_ref(root, "old_audit", snapshot_id=sid_a,
                            ref_type="branch", max_ref_age_ms=1)
    # young: cap one year → survives
    iceberg.set_iceberg_ref(root, "fresh_tag", snapshot_id=sid_b,
                            max_ref_age_ms=365 * 24 * 3_600_000)
    # uncapped tag → survives forever
    iceberg.set_iceberg_ref(root, "pinned", snapshot_id=sid_c)
    out = iceberg.expire_iceberg_snapshots(root, keep=1)
    assert out["refs"] == ["old_audit"]
    assert sid_a in out["snapshots"], "aged ref's snapshot must expire"
    assert sid_b not in out["snapshots"] and sid_c not in out["snapshots"]
    meta = iceberg._load_metadata(root)
    assert set(meta.get("refs") or {}) == {"fresh_tag", "pinned"}
    # pinned snapshots still read; the aged one is gone
    assert iceberg.read_iceberg(spark, root, ref="fresh_tag").count() == 20
    assert iceberg.read_iceberg(spark, root, ref="pinned").count() == 30
    with pytest.raises(ValueError):
        iceberg.read_iceberg(spark, root, snapshot_id=sid_a).count()


def test_ref_aging_commits_even_without_expirable_snapshots(spark, tmp_path):
    """An aged-out ref is removed even when no snapshot can expire (all
    within keep) — the removal is a metadata commit of its own."""
    root = str(tmp_path / "agekeep")
    _append(spark, root, 0, 5)
    sid = iceberg._load_metadata(root)["current-snapshot-id"]
    _append(spark, root, 5, 10)
    iceberg.set_iceberg_ref(root, "ephemeral", snapshot_id=sid,
                            max_ref_age_ms=1)
    out = iceberg.expire_iceberg_snapshots(root, keep=10)
    assert out == {"snapshots": [], "files": [], "refs": ["ephemeral"]}
    assert "ephemeral" not in (iceberg._load_metadata(root).get("refs") or {})
    # second run: nothing left to age
    out2 = iceberg.expire_iceberg_snapshots(root, keep=10)
    assert out2["refs"] == []


def test_main_never_ages_out(spark, tmp_path):
    root = str(tmp_path / "mainage")
    _append(spark, root, 0, 5)
    meta = dict(iceberg._load_metadata(root))
    refs = dict(meta.get("refs") or {})
    refs["main"] = {
        "snapshot-id": meta["current-snapshot-id"],
        "type": "branch",
        "max-ref-age-ms": 1,
    }
    meta["refs"] = refs
    iceberg._swap_metadata(root, meta)
    out = iceberg.expire_iceberg_snapshots(root, keep=10)
    assert out["refs"] == []
    assert "main" in iceberg._load_metadata(root)["refs"]


def test_set_ref_rejects_nonpositive_age(spark, tmp_path):
    root = str(tmp_path / "badage")
    _append(spark, root, 0, 5)
    with pytest.raises(ValueError, match="positive"):
        iceberg.set_iceberg_ref(root, "x", max_ref_age_ms=0)
