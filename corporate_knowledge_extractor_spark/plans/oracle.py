"""Pure-pandas oracle: reference-semantics triple extraction.

The P/R gate (BASELINE.json: P/R >= 0.95) needs an independent
re-statement of the extraction rules to compare the Spark pipeline
against — the analogue of the reference's golden-baseline regression
diff (/root/reference/scripts/compare_reports.py + tests/fixtures/
sample_output.json). This module is deliberately *not* Spark: plain
`re` + dict loops, the same execution style as the reference itself,
sharing only the rule constants (functions/rules.py) with the pipeline.

Every ordering rule the reference relies on (first-seen-wins dedup,
per-block caps in list order — SURVEY.md §7 "exact tie-breaking parity")
is reproduced with explicit sorts.
"""

from __future__ import annotations

import re

import pandas as pd

from corporate_knowledge_extractor_spark.config import EngineConfig, DEFAULT_CONFIG
from corporate_knowledge_extractor_spark.functions import rules

_RE_IMPORT = re.compile(rules.RE_IMPORT)
_RE_FROM = re.compile(rules.RE_FROM_IMPORT)
_RE_DEF = re.compile(rules.RE_DEF)
_RE_CALL = re.compile(rules.RE_CALL)
_RE_PERSON = re.compile(rules.RE_PERSON_COMMENT)
_RE_NAME = re.compile(rules.RE_PERSON_NAME)
_RE_EMAIL = re.compile(rules.RE_EMAIL)
_RE_PHONE = re.compile(rules.RE_PHONE)
_WS = re.compile(r"\s+")


def _redact(s: str) -> str:
    s = _RE_NAME.sub(rules.MASK_PERSON, s)
    s = _RE_EMAIL.sub(rules.MASK_EMAIL, s)
    s = _RE_PHONE.sub(rules.MASK_PHONE, s)
    return s


def _norm(s: str) -> str:
    return _WS.sub(" ", s.lower()).strip()


def _doc_mentions(content: str, cfg: EngineConfig) -> list[dict]:
    lines = content.split("\n")
    # blocks via blank-line sessionization (segment.assign_blocks parity)
    rows = []
    sep_count = 0
    for line_no, line in enumerate(lines):
        if line.strip() == "":
            sep_count += 1
            continue
        rows.append((line_no, sep_count, line))

    # junk-block filter (mentions.junk_block_filter parity)
    junk_blocks = {
        b
        for (_ln, b, line) in rows
        if any(p in line.lower() for p in rules.JUNK_BLOCK_PATTERNS)
    }
    rows = [r for r in rows if r[1] not in junk_blocks]

    mentions = []
    for line_no, block_id, line in rows:
        found: list[tuple[str, str]] = []
        m = _RE_IMPORT.search(line)
        if m:
            found.append(("import", m.group(1)))
        m = _RE_FROM.search(line)
        if m:
            found.append(("import", m.group(1)))
            found.append(("import_symbol", m.group(2)))
        m = _RE_DEF.search(line)
        if m:
            found.append(("function_def", m.group(1)))
        m = _RE_CALL.search(line)
        if m:
            found.append(("call", m.group(1)))
        m = _RE_PERSON.search(line)
        if m:
            found.append(("person", m.group(1)))
        for mtype, surface in found:
            mentions.append(
                {
                    "line_no": line_no,
                    "block_id": block_id,
                    "mention_type": mtype,
                    "surface": surface,
                    "_torder": rules.MENTION_TYPE_ORDER[mtype],
                }
            )

    # caps (mentions.cap_mentions parity): per-block then per-doc
    mentions.sort(key=lambda m: (m["line_no"], m["_torder"]))
    per_block: dict[int, int] = {}
    kept = []
    for m in mentions:
        per_block[m["block_id"]] = per_block.get(m["block_id"], 0) + 1
        if per_block[m["block_id"]] <= cfg.mentions.max_per_block:
            kept.append(m)
    kept = kept[: cfg.mentions.max_total]
    for idx, m in enumerate(kept, start=1):
        m["orig_idx"] = idx
        m["surface"] = _redact(m["surface"])
    return kept


def _doc_triples(doc: dict, cfg: EngineConfig) -> list[dict]:
    mentions = _doc_mentions(doc["content"], cfg)
    doc_key = f"{doc['repo']}/{doc['path']}"

    defs_per_block: dict[int, str] = {}
    for m in mentions:
        if m["mention_type"] == "function_def" and m["block_id"] not in defs_per_block:
            defs_per_block[m["block_id"]] = m["surface"]  # min line_no = first seen

    triples = []
    for m in mentions:
        frame_id = f"{m['orig_idx']:03d}"
        t = None
        if m["mention_type"] == "import":
            t = (doc_key, "imports", m["surface"])
        elif m["mention_type"] == "import_symbol":
            t = (doc_key, "imports_symbol", m["surface"])
        elif m["mention_type"] == "function_def":
            t = (doc_key, "defines", m["surface"])
        elif m["mention_type"] == "call":
            fn = defs_per_block.get(m["block_id"])
            if fn is not None:
                t = (f"{doc_key}::{fn}", "calls", m["surface"])
        if t is not None:
            triples.append(
                {
                    "repo": doc["repo"],
                    "path": doc["path"],
                    "commit": doc["commit"],
                    "subj": t[0],
                    "pred": t[1],
                    "obj": t[2],
                    "frame_id": frame_id,
                    "line_no": m["line_no"],
                }
            )

    # dedup, first-seen-wins (postprocess.dedup_triples parity)
    seen = set()
    deduped = []
    for t in sorted(triples, key=lambda t: (t["line_no"], t["frame_id"])):
        key = (_norm(t["subj"]), _norm(t["pred"]), _norm(t["obj"]))
        if key not in seen:
            seen.add(key)
            deduped.append(t)
    return deduped


def oracle_triples(docs: pd.DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """docs: pandas frame with (repo, path, commit, content)."""
    all_triples: list[dict] = []
    for doc in docs.to_dict("records"):
        all_triples.extend(_doc_triples(doc, cfg))

    # corpus-wide call validation (postprocess.validate_calls parity)
    known = {
        t["obj"] for t in all_triples if t["pred"] in ("defines", "imports_symbol")
    }
    all_triples = [
        t for t in all_triples if t["pred"] != "calls" or t["obj"] in known
    ]
    for t in all_triples:
        t["category"] = rules.categorize_text(t["obj"])
    return pd.DataFrame(all_triples)
