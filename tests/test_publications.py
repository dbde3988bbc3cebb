"""SND on the reference's NATIVE publication shape (pid, authors list<struct>)."""

import pandas as pd
import os

import pytest

import ray.data as rd

from whoiswho_ray.evaluation import pairwise_f1_frames
from whoiswho_ray.sources.publications import (
    PUBLICATION_SCHEMA,
    clamp_year,
    cluster_publications,
    make_mini_publications,
    normalized_from_publications,
)


@pytest.fixture(scope="module")
def mini_pubs():
    return make_mini_publications(seed=42)


class TestPublications:
    def test_schema_roundtrip(self, mini_pubs):
        pubs, truth = mini_pubs
        assert pubs.schema.equals(PUBLICATION_SCHEMA)
        ds = rd.from_arrow(pubs)
        assert ds.count() == pubs.num_rows

    def test_year_clamp_rule(self):
        # data_process.py:330-337 semantics
        assert clamp_year(2005) == 2005
        assert clamp_year(1499) == 0
        assert clamp_year(2024) == 0
        assert clamp_year("") == 0
        assert clamp_year(None) == 0

    def test_author_slot_explosion(self, mini_pubs):
        pubs, truth = mini_pubs
        norm = normalized_from_publications(rd.from_arrow(pubs)).to_pandas()
        # one record per author slot, keyed pid-idx
        n_slots = sum(len(a) for a in pubs.column("authors").to_pylist())
        assert len(norm) == n_slots
        assert norm["record_id"].is_unique
        assert norm["record_id"].str.match(r"p\d{5}-\d+").all()

    def test_variant_surface_forms_co_block(self, mini_pubs):
        """'John Smith' / 'J. Smith' / 'Smith, John' land in ONE block
        (name_block_key) — the r1 recall hole where abbreviated forms were
        never compared."""
        pubs, truth = mini_pubs
        norm = normalized_from_publications(rd.from_arrow(pubs)).to_pandas()
        smith = norm[norm["block_key"] == "smith.j"]
        assert smith["name"].nunique() >= 2  # several surfaces, same block
        # and no other block contains a smith-surface record
        assert set(norm[norm["name"].str.contains("smith")]["block_key"]) == {"smith.j"}

    def test_cluster_publications_f1(self, mini_pubs):
        """The reference's own task on its own data shape: cluster each
        ambiguous name's papers into per-person groups, F1 ≥ 0.99."""
        pubs, truth = mini_pubs
        clusters = cluster_publications(rd.from_arrow(pubs)).to_pandas()
        truth_df = truth.to_pandas()
        # evaluate only the ambiguous-name slots (coauthor slots are
        # unlabeled singletons, exactly like the reference evaluates only
        # the name under disambiguation)
        pred = clusters[clusters["record_id"].isin(set(truth_df["record_id"]))]
        ev = pairwise_f1_frames(pred, truth_df)
        mean_f1 = ev.loc[ev["block_key"] == "__mean__", "f1"].iloc[0]
        assert mean_f1 >= 0.99, ev.to_string()


class TestWhoIsWhoJsonIngest:
    def _dump(self, tmp_path):
        import json

        from whoiswho_ray.sources.publications import make_mini_publications

        pubs, truth = make_mini_publications(seed=5)
        rows = pubs.to_pylist()
        dump = {r["pid"]: {**r, "id": r["pid"]} for r in rows}
        # v3-style mess: keywords sometimes a string, year a string, org absent
        k = next(iter(dump))
        dump[k]["keywords"] = "single keyword"
        dump[k]["year"] = str(dump[k]["year"])
        dump[k]["authors"] = [{"name": a["name"]} for a in dump[k]["authors"]]
        p_json = str(tmp_path / "pubs.json")
        with open(p_json, "w") as f:
            json.dump(dump, f)
        p_jsonl = str(tmp_path / "pubs.jsonl")
        with open(p_jsonl, "w") as f:
            for r in dump.values():
                f.write(json.dumps(r) + "\n")
        return pubs, truth, p_json, p_jsonl

    def test_dict_dump_round_trip_and_cluster(self, ray_session, tmp_path):
        from whoiswho_ray.evaluation import pairwise_f1_frames
        from whoiswho_ray.sources.publications import (
            cluster_publications,
            publications_from_whoiswho_json,
        )

        pubs, truth, p_json, _ = self._dump(tmp_path)
        ds = publications_from_whoiswho_json(p_json)
        assert ds.count() == pubs.num_rows
        clusters = cluster_publications(ds).to_pandas()
        ev = pairwise_f1_frames(clusters, truth.to_pandas())
        mean_f1 = ev.loc[ev["block_key"] == "__mean__", "f1"].iloc[0]
        assert mean_f1 >= 0.99, ev.to_string()

    def test_jsonl_equals_dict_dump(self, ray_session, tmp_path):
        import pandas as pd

        from whoiswho_ray.sources.publications import publications_from_whoiswho_json

        _, _, p_json, p_jsonl = self._dump(tmp_path)
        a = publications_from_whoiswho_json(p_json).to_pandas()
        b = publications_from_whoiswho_json(p_jsonl).to_pandas()
        a = a.sort_values("pid").reset_index(drop=True)
        b = b.sort_values("pid").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_truth_loader(self, tmp_path):
        import json

        from whoiswho_ray.sources.publications import truth_from_whoiswho_json

        p = str(tmp_path / "train_author.json")
        with open(p, "w") as f:
            json.dump({"John Smith": {"a1": ["p1", "p2"], "a2": ["p3"]}}, f)
        df = truth_from_whoiswho_json(p)
        assert len(df) == 3 and set(df["entity_id"]) == {"a1", "a2"}
        assert df["block_key"].nunique() == 1


class TestFetcher:
    """S1's download half (load_utils.py:25-173 analog) exercised via
    file:// URLs — cache-if-exists, atomic writes, checksum gates."""

    def _mirror(self, tmp_path):
        import json

        src = tmp_path / "mirror" / "na-v3"
        src.mkdir(parents=True)
        (src / "sna_test_raw.json").write_text(json.dumps({"n": ["p1"]}))
        (src / "sna_test_pub.json").write_text(json.dumps(
            {"p1": {"id": "p1", "title": "T", "authors": [
                {"name": "A B", "org": "O"}], "venue": "V", "year": 2020,
                "keywords": ["k"]}}))
        return f"file://{tmp_path}/mirror"

    def test_fetch_cache_and_checksum(self, tmp_path):
        import hashlib

        from whoiswho_ray.sources.fetch import dataset_manifest, fetch_dataset

        assert dataset_manifest("v3", "SND", "test") == [
            "sna_test_raw.json", "sna_test_pub.json"]
        base = self._mirror(tmp_path)
        dest = str(tmp_path / "cache")
        got = fetch_dataset(base, "v3", "SND", "test", dest)
        assert all(os.path.exists(p) for p in got.values())
        # cache hit: corrupt the mirror, re-fetch without force — untouched
        mtimes = {p: os.path.getmtime(p) for p in got.values()}
        got2 = fetch_dataset(base, "v3", "SND", "test", dest)
        assert {p: os.path.getmtime(p) for p in got2.values()} == mtimes
        # checksum mismatch on a cached file forces re-download
        bad = {os.path.basename(list(got)[0]): "0" * 64}
        with pytest.raises(RuntimeError, match="checksum mismatch"):
            fetch_dataset(base, "v3", "SND", "test", dest,
                          checksums={"sna_test_raw.json": "0" * 64})
        # correct checksum passes
        p = got["sna_test_pub.json"]
        digest = hashlib.sha256(open(p, "rb").read()).hexdigest()
        fetch_dataset(base, "v3", "SND", "test", dest,
                      checksums={"sna_test_pub.json": digest})

    def test_load_dataset_streams_publications(self, tmp_path, ray_session):
        from whoiswho_ray.sources.fetch import load_dataset

        base = self._mirror(tmp_path)
        ds = load_dataset(base, "v3", "SND", "test", str(tmp_path / "c2"))
        df = ds.to_pandas()
        assert len(df) == 1 and df["title"].iloc[0] == "T"

    def test_offline_error_is_clear(self, tmp_path):
        from whoiswho_ray.sources.fetch import fetch_dataset

        with pytest.raises(RuntimeError, match="fetch failed"):
            fetch_dataset(f"file://{tmp_path}/nonexistent", "v3", "SND",
                          "test", str(tmp_path / "c3"))
