"""Dataset fetcher — the download half of operator S1.

The reference's ``LoadData`` (``/root/reference/whoiswho/dataset/
load_utils.py:25-173``) maps a (name, task, split) triple to the WhoIsWho
distribution's fixed file list, downloads each file if not already
cached, and returns the parsed JSON. This module re-expresses the same
contract from scratch:

* :func:`dataset_manifest` — the (name, task, split) → filename mapping
  (the public WhoIsWho v1/v2/v3 distribution layout).
* :func:`fetch_dataset` — cache-if-exists download with atomic rename
  and optional sha256 verification. Uses stdlib ``urllib`` only; works
  with any URL scheme it supports, including ``file://`` (how the tests
  exercise it in this offline container). The base URL is an explicit
  argument — point it at the public mirror you use.
* :func:`load_dataset` — fetch + stream the publication JSON into a Ray
  Dataset via ``publications_from_whoiswho_json`` (chunked ingest; the
  driver never holds the whole dump).

Scale note: the download itself is a driver-side convenience exactly as
in the reference; the *ingest* is chunked and the resulting Dataset
streams. For 100 TB inputs, skip the fetcher and point
``ray.data.read_parquet`` / ``read_json`` at shared storage.
"""

from __future__ import annotations

import hashlib
import os

_NAMES = ("v1", "v2", "v3")
_TASKS = ("SND", "RND")
_SPLITS = ("train", "valid", "test")

# (task, split) → file list, the reference's URL table flattened
# (load_utils.py:46-115). File names are the public distribution layout.
_FILES: dict[tuple[str, str], tuple[str, ...]] = {
    ("SND", "train"): ("train_author.json", "train_pub.json"),
    ("RND", "train"): ("train_author.json", "train_pub.json"),
    ("SND", "valid"): ("sna_valid_raw.json", "sna_valid_pub.json",
                       "sna_valid_example.json"),
    ("RND", "valid"): ("whole_author_profiles.json",
                       "whole_author_profiles_pub.json",
                       "cna_valid_unass.json", "cna_valid_unass_pub.json",
                       "cna_valid_ground_truth.json"),
    ("SND", "test"): ("sna_test_raw.json", "sna_test_pub.json"),
    ("RND", "test"): ("cna_test_unass.json", "cna_test_unass_pub.json"),
}


def dataset_manifest(name: str, task: str, split: str) -> list[str]:
    """File names for one dataset cell, validated like ``LoadData``."""
    if name not in _NAMES:
        raise ValueError(f"name must be one of {_NAMES}")
    if task not in _TASKS:
        raise ValueError(f"task must be one of {_TASKS}")
    if split not in _SPLITS:
        raise ValueError(f"split must be one of {_SPLITS}")
    return list(_FILES[(task, split)])


def _download(url: str, dest: str, chunk: int = 1 << 20) -> str:
    """Stream one URL to ``dest`` atomically (tmp file + rename); returns
    the sha256 hex of the downloaded bytes."""
    import urllib.request

    tmp = dest + ".part"
    h = hashlib.sha256()
    try:
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            while True:
                b = r.read(chunk)
                if not b:
                    break
                h.update(b)
                f.write(b)
    except Exception as e:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise RuntimeError(
            f"fetch failed for {url!r}: {e}. This container has no network "
            "access — use a file:// mirror or pre-populated dest_dir."
        ) from e
    os.replace(tmp, dest)
    return h.hexdigest()


def fetch_dataset(
    base_url: str,
    name: str,
    task: str,
    split: str,
    dest_dir: str,
    checksums: dict[str, str] | None = None,
    force: bool = False,
) -> dict:
    """Download one dataset cell's files under
    ``dest_dir/<name>/<task>/<split>/`` (cache-if-exists, like the
    reference). ``checksums``: optional filename → sha256 hex; a cached
    file failing its checksum is re-downloaded, a downloaded file failing
    it raises. Returns {filename: local_path}."""
    out_dir = os.path.join(dest_dir, name, task, split)
    os.makedirs(out_dir, exist_ok=True)
    got: dict[str, str] = {}
    for fname in dataset_manifest(name, task, split):
        dest = os.path.join(out_dir, fname)
        want = (checksums or {}).get(fname)
        cached_ok = False
        if os.path.exists(dest) and not force:
            if want is None:
                cached_ok = True
            else:
                with open(dest, "rb") as f:
                    cached_ok = hashlib.sha256(f.read()).hexdigest() == want
        if not cached_ok:
            url = f"{base_url.rstrip('/')}/na-{name}/{fname}"
            digest = _download(url, dest)
            if want is not None and digest != want:
                os.unlink(dest)
                raise RuntimeError(
                    f"checksum mismatch for {fname}: got {digest}, want {want}")
        got[fname] = dest
    return got


def load_dataset(
    base_url: str,
    name: str,
    task: str,
    split: str,
    dest_dir: str,
    pub_file: str | None = None,
    checksums: dict[str, str] | None = None,
):
    """Fetch one dataset cell and stream its publication dump into a Ray
    Dataset (``publications_from_whoiswho_json`` chunked ingest).
    ``pub_file`` defaults to the cell's ``*_pub.json`` entry."""
    from whoiswho_ray.sources.publications import publications_from_whoiswho_json

    files = fetch_dataset(base_url, name, task, split, dest_dir,
                          checksums=checksums)
    if pub_file is None:
        pubs = [f for f in files if f.endswith("_pub.json")]
        if not pubs:
            raise ValueError(f"no *_pub.json in cell {(name, task, split)}")
        pub_file = pubs[0]
    return publications_from_whoiswho_json(files[pub_file])
