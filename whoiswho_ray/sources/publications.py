"""WhoIsWho-native publication-shaped source.

The reference's record is a nested publication document
(``/root/reference/whoiswho/dataset/data_process.py:245-299``):
``pid, title, abstract, keywords, venue, year, authors:[{name, org}]``,
with the true unit of linkage being the *(paper, author-slot)* composite
``"{pid}-{idx}"`` (``data_process.py:458-461``). This module carries that
exact shape through Arrow (explicit nullable schema — replacing the
reference's implicit try/except schema, SURVEY.md §1.1) and adapts it onto
the engine's normalized record layout so the SND pipeline runs unchanged
on the reference's native data model:

=====================  =====================================================
publication field      engine signature
=====================  =====================================================
author name (slot)     block_key (cleaned name) + name (JW feature)
coauthor names         tok_ids (the w=high discriminative set)
author org tokens      repo_ids (org analog)
venue + year           ctx_ids (venue analog)
title/abstract/kw      tfidf source tokens (merged into tok_ids here;
                       the idf stage weighs them)
=====================  =====================================================
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.functions.hashing import hash_tokens64, sha256_hex
from whoiswho_ray.functions.names import name_block_key, tokenize_name
from whoiswho_ray.functions.textnorm import clean_text, tokenize_text

PUBLICATION_SCHEMA = pa.schema([
    ("pid", pa.string()),
    ("title", pa.string()),
    ("abstract", pa.string()),
    ("keywords", pa.list_(pa.string())),
    ("venue", pa.string()),
    ("year", pa.int32()),
    ("authors", pa.list_(pa.struct([("name", pa.string()), ("org", pa.string())]))),
])


def clamp_year(y) -> int:
    """The reference's year hygiene (``data_process.py:330-337``):
    missing → 0, clamped to [1500, 2023]."""
    try:
        y = int(y)
    except (TypeError, ValueError):
        return 0
    return y if 1500 <= y <= 2023 else 0


def _clean_name(name: str) -> str:
    return "".join(clean_text(name or "").split())


def normalized_from_publications(
    pubs: "rd.Dataset",
    cfg: SNDConfig | None = None,
) -> "rd.Dataset":
    """Publications → one engine-normalized row per (paper, author-slot).

    The flat_map over author slots replaces the reference's
    ``get_author_index`` resolution (``whoiswho/utils.py:99-161``): every
    slot becomes a linkage record keyed ``pid-idx``, blocked by its
    **abbreviation/order-invariant name key** (``names.name_block_key``) —
    "John Smith", "J. Smith" and "Smith, John" co-block, closing the r1
    recall hole where abbreviated forms were never compared. The ``name``
    column carries the nickname-canonicalized token form so the
    Jaro-Winkler feature sees normalized surfaces."""
    cfg = cfg or SNDConfig()

    def explode(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("record_id", "block_key", "name", "repo", "path",
                               "commit", "lang", "content_sha256", "n_toks",
                               "tok_ids", "repo_ids", "ctx_ids")}
        pids = t.column("pid").to_pylist()
        titles = t.column("title").to_pylist()
        abstracts = t.column("abstract").to_pylist()
        keywords = t.column("keywords").to_pylist()
        venues = t.column("venue").to_pylist()
        years = t.column("year").to_pylist()
        authors_col = t.column("authors").to_pylist()
        for i in range(len(pids)):
            authors = authors_col[i] or []
            text = " ".join(filter(None, [titles[i], abstracts[i],
                                          " ".join(keywords[i] or [])]))
            text_toks = tokenize_text(text)
            venue_toks = tokenize_text(venues[i] or "")
            year = clamp_year(years[i])
            coauthor_names = [_clean_name(a.get("name", "")) for a in authors]
            for idx, a in enumerate(authors):
                raw_name = a.get("name", "") or ""
                me = name_block_key(raw_name)
                if not me:
                    continue
                rid = f"{pids[i]}-{idx}"
                coauthors = [c for j, c in enumerate(coauthor_names) if j != idx and c]
                org_toks = tokenize_text(a.get("org") or "")
                ctx = venue_toks + ([f"y{year}"] if year else [])
                out["record_id"].append(rid)
                out["block_key"].append(me)
                out["name"].append(" ".join(tokenize_name(raw_name)))
                out["repo"].append(a.get("org") or "")
                out["path"].append(rid)
                out["commit"].append(pids[i])
                out["lang"].append("")
                out["content_sha256"].append(sha256_hex(text))
                out["n_toks"].append(len(coauthors) + len(text_toks))
                out["tok_ids"].append(hash_tokens64(coauthors + text_toks).tolist())
                out["repo_ids"].append(hash_tokens64(org_toks).tolist())
                out["ctx_ids"].append(hash_tokens64(ctx).tolist())
        return pa.table({
            **{k: pa.array(out[k], pa.string()) for k in
               ("record_id", "block_key", "name", "repo", "path", "commit",
                "lang", "content_sha256")},
            "n_toks": pa.array(out["n_toks"], pa.int32()),
            **{k: pa.array(out[k], pa.list_(pa.int64())) for k in
               ("tok_ids", "repo_ids", "ctx_ids")},
        })

    return pubs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def cluster_publications(pubs: "rd.Dataset", cfg: SNDConfig | None = None) -> "rd.Dataset":
    """End-to-end SND on WhoIsWho-shaped publications: returns
    (block_key, record_id='pid-idx', cluster_id, content_sha256)."""
    from whoiswho_ray.pipelines.snd import snd_cluster
    from whoiswho_ray.stages.idf import build_idf
    from whoiswho_ray.stages.scoring import vectorize

    cfg = cfg or SNDConfig()
    norm = normalized_from_publications(pubs, cfg).materialize()
    idf = build_idf(norm, cfg)
    vec = vectorize(norm, idf, cfg)
    return snd_cluster(norm, vec, cfg)


def _surface_variants(name: str) -> list[str]:
    """Surface forms one canonical "First Last" name appears under in real
    bibliographies: canonical, first-initial abbreviation, comma-reversed."""
    parts = name.split()
    if len(parts) < 2:
        return [name]
    first, last = parts[0], parts[-1]
    return [name, f"{first[0]}. {last}", f"{last}, {first}"]


def make_mini_publications(seed: int = 42) -> tuple[pa.Table, "pa.Table"]:
    """Deterministic WhoIsWho-shaped mini fixture (FIXTURES.md §4): a few
    ambiguous names, 2–3 planted authors each, distinguishable by coauthor
    circles + orgs. Every author's name appears under VARIANT surface forms
    ("John Smith" / "J. Smith" / "Smith, John") — the abbreviation-recall
    case the r1 blocking missed. Returns (publications, truth) where
    truth = (block_key, entity_id, record_id='pid-idx')."""
    rng = np.random.RandomState(seed)
    names = ["Wei Zhang", "John Smith", "Maria Garcia"]
    coauthor_pool = [f"Coauthor {c}{i}" for c in "ABCDEF" for i in range(6)]
    venue_pool = ["ICML", "KDD", "VLDB", "ICDE", "ACL", "NeurIPS"]
    word_pool = [f"topic{i:03d}" for i in range(200)]

    pubs_rows = []
    truth = {"block_key": [], "entity_id": [], "record_id": []}
    pid_counter = 0
    for name in names:
        variants = _surface_variants(name)
        n_entities = 2 + rng.randint(0, 2)
        for e in range(n_entities):
            entity_id = f"{name_block_key(name)}#{e}"
            circle = list(rng.choice(coauthor_pool, size=5, replace=False))
            org = f"University {rng.randint(100)} Dept {rng.randint(10)}"
            topics = list(rng.choice(word_pool, size=12, replace=False))
            venues = list(rng.choice(venue_pool, size=2, replace=False))
            for _ in range(4 + rng.randint(0, 5)):
                pid = f"p{pid_counter:05d}"
                pid_counter += 1
                surface = variants[int(rng.randint(len(variants)))]
                ca = list(rng.choice(circle, size=3, replace=False))
                slot = int(rng.randint(0, 4))
                authors = [{"name": c, "org": f"Org of {c}"} for c in ca]
                authors.insert(min(slot, len(authors)), {"name": surface, "org": org})
                idx = next(i for i, a in enumerate(authors) if a["name"] == surface)
                title_words = rng.choice(topics, size=6, replace=False)
                pubs_rows.append({
                    "pid": pid,
                    "title": " ".join(title_words),
                    "abstract": " ".join(rng.choice(topics, size=10)),
                    "keywords": list(rng.choice(topics, size=3, replace=False)),
                    "venue": venues[int(rng.randint(2))],
                    "year": int(2000 + rng.randint(24)),
                    "authors": authors,
                })
                truth["block_key"].append(name_block_key(name))
                truth["entity_id"].append(entity_id)
                truth["record_id"].append(f"{pid}-{idx}")
    pubs = pa.Table.from_pylist(pubs_rows, schema=PUBLICATION_SCHEMA)
    return pubs, pa.table(truth)


def _coerce_pub(pid: str, rec: dict) -> dict:
    """One raw WhoIsWho publication dict → the engine's pubs row.

    Tolerates the v2/v3 format mess the reference's loaders paper over
    (``whoiswho/dataset/data_process.py``, ``whoiswho/utils.py:LoadData``):
    keywords as list or single string, year as int / numeric string /
    missing, authors without org, title/abstract/venue null."""
    kws = rec.get("keywords")
    if isinstance(kws, str):
        kws = [kws]
    kws = [k for k in (kws or []) if isinstance(k, str)]
    year = rec.get("year")
    try:
        year = int(year) if year not in (None, "") else 0
    except (TypeError, ValueError):
        year = 0
    authors = [{"name": (a.get("name") or ""), "org": (a.get("org") or "")}
               for a in (rec.get("authors") or []) if isinstance(a, dict)]
    return {
        "pid": str(rec.get("id") or pid),
        "title": rec.get("title") or "",
        "abstract": rec.get("abstract") or "",
        "keywords": kws,
        "venue": (rec.get("venue") if isinstance(rec.get("venue"), str)
                  else (rec.get("venue") or {}).get("raw", "") or ""),
        "year": year,
        "authors": authors,
    }


def publications_from_whoiswho_json(path: str, chunk_rows: int = 8192) -> "rd.Dataset":
    """Ingest the reference's NATIVE publication JSON.

    Two layouts:
    - ``*.jsonl`` — one publication object per line: streamed with
      ``ray.data.read_json`` (arbitrarily large; the scale path — convert
      dict dumps to JSONL or Parquet once, then everything streams).
    - ``*.json`` — the WhoIsWho dump layout, ONE dict ``{pid: record}``
      (``whoiswho/utils.py:LoadData`` json.loads the whole file too; the
      format itself forces a single-process parse). Parsed once on the
      driver, emitted as chunked Arrow tables so no single block holds
      the corpus; bounded by the dump file size, same as the reference.

    Returns the pubs Dataset consumed by ``normalized_from_publications``
    / ``cluster_publications``.
    """
    import json

    if path.endswith(".jsonl"):
        # read_text + per-line parse, NOT ray.data.read_json: the v2/v3
        # dumps mix types per field (keywords str|list, year str|int),
        # which breaks Arrow's schema inference mid-file; _coerce_pub is
        # the schema authority either way
        raw = rd.read_text(path)
        return raw.map_batches(
            lambda t: pa.Table.from_pylist(
                [_coerce_pub("", json.loads(line))
                 for line in t.column("text").to_pylist() if line.strip()],
                schema=_PUBS_SCHEMA),
            batch_format="pyarrow")

    with open(path) as f:
        dump = json.load(f)
    if not isinstance(dump, dict):  # array-of-records layout
        dump = {str(i): r for i, r in enumerate(dump)}
    rows = [_coerce_pub(pid, rec) for pid, rec in dump.items()]
    tables = [pa.Table.from_pylist(rows[i:i + chunk_rows], schema=_PUBS_SCHEMA)
              for i in range(0, max(len(rows), 1), chunk_rows)]
    return rd.from_arrow(tables)


def truth_from_whoiswho_json(path: str) -> pd.DataFrame:
    """Ingest the reference's ground-truth layout ``{name: {author_id:
    [pids]}}`` (train_author.json and friends) → a (block_key, entity_id,
    pid) frame; join against exploded records on the pid prefix of
    record_id for evaluation. Small by construction (labels only)."""
    import json

    from whoiswho_ray.functions.names import name_block_key

    with open(path) as f:
        dump = json.load(f)
    rows = {"block_key": [], "entity_id": [], "pid": []}
    for name, ents in dump.items():
        bk = name_block_key(name)
        for aid, pids in (ents or {}).items():
            for pid in pids or []:
                rows["block_key"].append(bk)
                rows["entity_id"].append(str(aid))
                rows["pid"].append(str(pid))
    return pd.DataFrame(rows)


_PUBS_SCHEMA = pa.schema([
    ("pid", pa.string()),
    ("title", pa.string()),
    ("abstract", pa.string()),
    ("keywords", pa.list_(pa.string())),
    ("venue", pa.string()),
    ("year", pa.int64()),
    ("authors", pa.list_(pa.struct([("name", pa.string()),
                                    ("org", pa.string())]))),
])
