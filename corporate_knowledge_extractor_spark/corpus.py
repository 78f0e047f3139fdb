"""Deterministic synthetic source-code corpus.

BASELINE.json's input contract is an Iceberg-style table of source-code
repositories ``(repo, path, commit, lang, content)``. There is no external
data in the sandbox, so this module synthesizes that table
deterministically (seed folded into each row id — same row ids always
yield byte-identical content, at any parallelism, in any order).

Generation is *distributed*: ``spark.range(n_docs)`` + ``mapInPandas``,
one Arrow batch at a time — no driver-side list is ever built, so the
same code generates a 10^12-row corpus on a real cluster by raising
``n_docs``. A pure-pandas twin (``generate_corpus_pandas``) feeds the
P/R oracle on identical bytes.

Content mirrors the FIXTURES.md §1 recipe: import lines, function defs
calling other generated modules, maintainer comments with names / emails
/ phones (redaction targets), junk blocks (junk-filter targets), and
near-duplicate blocks (dedup targets). Function names are drawn from a
global entity pool with alias variants (snake_case / camelCase / ``_v2``)
so entity linking has real work to do; ``entity_aliases()`` exposes the
ground truth for linking tests.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

SEED = 42

LANGS = ["python", "python", "python", "java", "go", "markdown"]  # ~60/20/10/10 intent
VERBS = [
    "get", "set", "load", "save", "parse", "build", "make", "run",
    "init", "sync", "fetch", "push", "merge", "split", "check",
]
NOUNS = [
    "user", "data", "config", "cache", "token", "index", "graph", "node",
    "edge", "file", "record", "batch", "stream", "query", "table",
]
STDLIB = ["os", "sys", "json", "math", "time", "logging", "re", "itertools"]
FIRST_NAMES = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi"]
LAST_NAMES = ["Smith", "Jones", "Chen", "Garcia", "Patel", "Kim", "Novak", "Okafor"]
JUNK_LINES = [
    "# thank you for watching",
    "# copyright 2024 example corp, all rights reserved",
    "# auto-generated file, do not edit",
]
DOC_WORDS = [
    "returns", "the", "computed", "value", "for", "given", "input", "handles",
    "errors", "by", "raising", "caches", "results", "when", "possible",
]


def n_docs_for_sf(sf: float) -> int:
    """sf0.001 -> 500 docs, sf0.01 -> 5_000, sf0.1 -> 50_000 (TESTDATA.md scale)."""
    return max(50, int(500_000 * sf))


def n_repos_for_sf(sf: float) -> int:
    """FIXTURES.md §1: r in [0, 20*sf*1000)."""
    return max(2, int(20_000 * sf))


def n_entities(n_docs: int) -> int:
    return max(60, min(len(VERBS) * len(NOUNS) * 40, n_docs // 4))


def entity_base(e: int) -> str:
    v = VERBS[e % len(VERBS)]
    n = NOUNS[(e // len(VERBS)) % len(NOUNS)]
    gen = e // (len(VERBS) * len(NOUNS))
    return f"{v}_{n}" if gen == 0 else f"{v}_{n}_{gen}"


def _camel(s: str) -> str:
    parts = s.split("_")
    return parts[0] + "".join(p.capitalize() for p in parts[1:])


def entity_aliases(e: int) -> list[str]:
    """All surface forms of entity ``e`` — ground truth for linking tests."""
    base = entity_base(e)
    return [base, _camel(base), f"{base}_v2", base.replace("_", "")]


def _alias_for(rng: random.Random, e: int) -> str:
    return rng.choice(entity_aliases(e))


def _repo_for_doc(i: int, n_docs: int, n_repos: int) -> int:
    # Zipf-ish skew: quadratic ramp concentrates docs in low repo ids,
    # exercising the salting / AQE-skew paths (SURVEY.md §7 risks).
    frac = (i / max(1, n_docs)) ** 2
    return min(n_repos - 1, int(frac * n_repos))


def generate_doc(i: int, n_docs: int, n_repos: int) -> dict:
    """Pure function of the row id — the determinism contract."""
    rng = random.Random((SEED << 32) ^ i)
    repo_idx = _repo_for_doc(i, n_docs, n_repos)
    repo = f"org{repo_idx // 10}/repo{repo_idx}"
    lang = LANGS[rng.randrange(len(LANGS))]
    ext = {"python": "py", "java": "java", "go": "go", "markdown": "md"}[lang]
    path = f"src/pkg{i % 7}/mod_{i}.{ext}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()

    ents = n_entities(n_docs)
    lines: list[str] = [f"# Module mod_{i} of {repo}"]
    if rng.random() < 0.30:
        first = rng.choice(FIRST_NAMES)
        last = rng.choice(LAST_NAMES)
        email = f"{first.lower()}.{last.lower()}@example.com"
        lines.append(f"# Maintainer: {first} {last} <{email}>")
    if rng.random() < 0.10:
        lines.append(f"# Support line: +1 {rng.randrange(200,999)} 555 {rng.randrange(1000,9999)}")
    lines.append("")

    # imports: other generated modules + stdlib-ish names
    for _ in range(rng.randrange(2, 7)):
        if rng.random() < 0.5:
            target = rng.randrange(n_docs)
            lines.append(f"import pkg{target % 7}.mod_{target}")
        elif rng.random() < 0.5:
            lines.append(f"import {rng.choice(STDLIB)}")
        else:
            sym_e = rng.randrange(ents)
            target = rng.randrange(n_docs)
            lines.append(f"from pkg{target % 7}.mod_{target} import {_alias_for(rng, sym_e)}")
    lines.append("")

    def_blocks: list[list[str]] = []
    for _ in range(rng.randrange(1, 9)):
        fn_e = rng.randrange(ents)
        fn = _alias_for(rng, fn_e)
        params = ", ".join(rng.sample(["x", "y", "key", "opts", "limit"], rng.randrange(0, 4)))
        block = [f"def {fn}({params}):"]
        block.append(f'    """{" ".join(rng.choice(DOC_WORDS) for _ in range(rng.randrange(4, 10)))}"""')
        for _b in range(rng.randrange(1, 4)):
            callee = _alias_for(rng, rng.randrange(ents))
            var = rng.choice(["out", "res", "val", "acc"])
            block.append(f"    {var} = {callee}({params.split(', ')[0] if params else ''})")
        block.append(f"    return {rng.choice(['out', 'res', 'val', 'acc'])}")
        def_blocks.append(block)
        lines.extend(block)
        lines.append("")

    if rng.random() < 0.10:
        lines.extend(rng.sample(JUNK_LINES, rng.randrange(1, len(JUNK_LINES) + 1)))
        lines.append("")
    if def_blocks and rng.random() < 0.15:
        # near-duplicate of an earlier def block (dedup target): extra
        # trailing spaces only, so normalized forms collide
        dup = [ln + "  " for ln in rng.choice(def_blocks)]
        lines.extend(dup)
        lines.append("")

    content = "\n".join(lines)
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
    }


CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


def generate_corpus(spark, sf: float = 0.001, n_docs: int | None = None):
    """Distributed corpus DataFrame — `spark.range` + `mapInPandas`.

    The range source parallelizes the id space; each task materializes
    only its own Arrow batches. This is the 10^12-scale generation path.
    """
    nd = n_docs if n_docs is not None else n_docs_for_sf(sf)
    nr = n_repos_for_sf(sf)

    def gen(batches):
        for pdf in batches:
            rows = [generate_doc(int(i), nd, nr) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    parallelism = spark.sparkContext.defaultParallelism
    return spark.range(0, nd, numPartitions=min(nd, parallelism * 2)).mapInPandas(
        gen, schema=CORPUS_SCHEMA
    )


def generate_corpus_pandas(sf: float = 0.001, n_docs: int | None = None) -> pd.DataFrame:
    """Driver-side twin for the pandas oracle — identical bytes by construction."""
    nd = n_docs if n_docs is not None else n_docs_for_sf(sf)
    nr = n_repos_for_sf(sf)
    return pd.DataFrame([generate_doc(i, nd, nr) for i in range(nd)])


def _generator_version() -> str:
    """Hash of this module's source — the twin-parquet cache key includes
    it so editing the generator invalidates stale cached corpora instead
    of silently desyncing the DuckDB oracle from the Spark corpus."""
    import hashlib as _h
    import os

    with open(os.path.abspath(__file__), "rb") as f:
        return _h.sha256(f.read()).hexdigest()[:12]


def twin_corpus_parquet(sf: float) -> str:
    """Materialize the pandas-twin corpus as a parquet file and return its
    path (cached across processes, keyed by (seed, sf, generator-code
    hash); atomic rename so concurrent callers can't observe a
    half-written file). This is what lets DuckDB oracles re-run the
    extraction rules over the *same bytes* the distributed generator
    produces (byte-equality is itself asserted by pipeline.verify_sha256 /
    tests/test_corpus.py)."""
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"ckes_twin_seed{SEED}_g{_generator_version()}_sf{sf}.parquet",
    )
    if not os.path.exists(path):
        tmp = f"{path}.tmp-{os.getpid()}"
        generate_corpus_pandas(sf=sf).to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path
