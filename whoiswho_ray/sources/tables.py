"""Parquet table readers with pruning at the read (SURVEY.md §2.1).

Replaces the reference's whole-file JSON loads
(``/root/reference/whoiswho/utils.py:25-31``) with columnar reads that
only pull the columns a pipeline touches out of storage."""

from __future__ import annotations

import os

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "rd.Dataset":
    """Read one testdata table with the writer's ``b'pandas'`` schema
    metadata stripped AT THE READ (explicit metadata-free ``schema=``):
    a dict-valued metadata blob makes ``pa.Schema`` unhashable, which
    knocks Ray's block-schema dedup onto its slow path and spams
    "Failed to hash the schemas" warnings from the read tasks through
    every downstream stage (VERDICT r4 #7)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, schema=sch, columns=columns)


def records_from_documents(sf_dir: str, n_blocks: int = 40) -> "rd.Dataset":
    """Deterministically derive an ``input_hint``-shaped records table
    ``(repo, path, commit, lang, content)`` from the ``documents`` table —
    the standing adapter between the driver's synthetic corpus and the
    engine's native input. Every derivation rule is SQL-expressible so the
    normalize stage has a DuckDB oracle."""
    import pyarrow as pa

    from whoiswho_ray.functions.hashing import sha256_hex

    def derive(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").to_pylist()
        text = t.column("text").to_pylist()
        lang = t.column("lang").to_pylist()
        source = t.column("source").to_pylist()
        return pa.table({
            "repo": pa.array([f"corpus/{s}" for s in source], pa.string()),
            "path": pa.array(
                [f"docs/{l}/doc{int(d) % n_blocks}.txt" for l, d in zip(lang, doc_id)],
                pa.string(),
            ),
            "commit": pa.array([sha256_hex(x or "")[:40] for x in text], pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(text, pa.string()),
        })

    return read_table(sf_dir, "documents").map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
