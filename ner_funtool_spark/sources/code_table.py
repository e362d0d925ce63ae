"""Deterministic synthetic source-code repository table + gold outputs.

Generates the input table mandated by BASELINE.json's ``input_hint`` —
``(repo, path, commit, lang, content)`` — plus gold mentions and gold
triples known by construction (FIXTURES.md F1).  No external data; the
whole table is a pure function of ``(seed, file_id)``, generated
distributively with ``spark.range(n).mapInPandas`` so any scale factor
partitions across executors without a driver-side materialization.

Repo assignment is power-law skewed so a few repos are hot — this is
what exercises the salted-key partitioning path (north_rule).

The grammar is intentionally small and unambiguous so the lexer-feature
CRF tagger (operators/tagger.py) can recover every entity exactly —
gold P/R is a real 1.0 gate, not a tuned threshold.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SEED

N_ORGS = 7
N_REPOS = 23
LANGS = ["python", "java", "go", "js"]
EXT = {"python": "py", "java": "java", "go": "go", "js": "js"}

_MODS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "kappa"]
_SUBS = ["core", "util", "net", "io", "db", "fmt"]
_FUNCS = ["load", "parse", "merge", "emit", "scan", "link", "score", "pack"]
_CLASSES = ["Reader", "Writer", "Linker", "Codec", "Graph", "Index"]
_PKGS = ["acme", "tools", "engine", "kernel"]
_FILLER = [
    "x = x + 1",
    "# synthetic filler line",
    "return result",
    "value = compute(x, y)",
    "// nothing to see here",
]


def make_file(file_id: int, seed: int = SEED) -> dict:
    """Pure deterministic file record + gold annotations.

    Returns dict with keys: repo, path, commit, lang, content,
    mentions [(sent_id, begin, end, text, etype)], where begin/end are
    character offsets into the sentence (end exclusive).
    """
    rng = np.random.default_rng((seed, file_id))
    # one batched draw per file: rng call overhead dominates generation
    # cost otherwise (~10us per call x ~150 calls)
    MAXL = 28
    ints = rng.integers(0, 1 << 30, size=3 + 6 * MAXL)
    floats = rng.random(size=2 + MAXL)
    org = int(ints[0]) % N_ORGS
    # power-law repo popularity -> hot-key skew
    repo_idx = int((floats[0] ** 3) * N_REPOS)
    repo = f"org{org}/repo{repo_idx}"
    lang = LANGS[int(ints[1]) % len(LANGS)]
    path = f"src/mod{int(ints[2]) % 9}/file{file_id}.{EXT[lang]}"
    commit = hashlib.md5(f"{seed}:{file_id}".encode()).hexdigest()[:12]

    lines: list[str] = []
    mentions: list[tuple[int, int, int, str, str]] = []

    def add_mention(sent_id: int, line: str, text: str, etype: str):
        begin = line.index(text)
        mentions.append((sent_id, begin, begin + len(text), text, etype))

    n_lines = 8 + int(floats[1] * (MAXL - 8))
    for li in range(n_lines):
        sent_id = len(lines)
        kind = float(floats[2 + li])
        iv = ints[3 + 6 * li : 9 + 6 * li]
        mod = _MODS[int(iv[0]) % len(_MODS)]
        sub = _SUBS[int(iv[1]) % len(_SUBS)]
        fn = f"{_FUNCS[int(iv[2]) % len(_FUNCS)]}_{int(iv[3]) % 50}"
        cls = f"{_CLASSES[int(iv[4]) % len(_CLASSES)]}{int(iv[3]) % 50}"
        if kind < 0.30:  # import
            if lang == "python":
                if int(iv[5]) % 2 == 0:
                    name = f"{mod}.{sub}"
                    line = f"import {name}"
                else:
                    name = f"{mod}.{sub}"
                    line = f"from {name} import {fn}"
            elif lang == "java":
                name = f"{mod}.{sub}"
                line = f"import {name};"
            elif lang == "go":
                name = mod
                line = f'import "{name}"'
            else:
                name = mod
                line = f'import "{name}";'
            lines.append(line)
            add_mention(sent_id, line, name, "module")
        elif kind < 0.55:  # function definition
            if lang == "python":
                line = f"def {fn}(a, b):"
            elif lang == "java":
                line = f"public void {fn}(int a) {{"
            elif lang == "go":
                line = f"func {fn}(a int) {{"
            else:
                line = f"function {fn}(a) {{"
            lines.append(line)
            add_mention(sent_id, line, fn, "func")
        elif kind < 0.72:  # class definition
            if lang == "python":
                line = f"class {cls}:"
            elif lang == "java":
                line = f"public class {cls} {{"
            elif lang == "go":
                line = f"type {cls} struct {{"
            else:
                line = f"class {cls} {{"
            lines.append(line)
            add_mention(sent_id, line, cls, "class")
        elif kind < 0.80 and lang in ("java", "go"):  # package declaration
            pkg = _PKGS[int(iv[5]) % len(_PKGS)]
            line = f"package {pkg};" if lang == "java" else f"package {pkg}"
            lines.append(line)
            add_mention(sent_id, line, pkg, "package")
        else:  # filler (no entities)
            lines.append(_FILLER[int(iv[5]) % len(_FILLER)])

    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": "\n".join(lines),
        "mentions": mentions,
    }


SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"
GOLD_MENTION_SCHEMA = (
    "repo string, path string, commit string, sent_id long, "
    "begin int, end int, text string, etype string"
)


def source_table(spark: SparkSession, n_files: int, seed: int = SEED,
                 partitions: int | None = None) -> DataFrame:
    """The (repo, path, commit, lang, content, content_sha) input table."""

    def gen(batches):
        for pdf in batches:
            recs = [make_file(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                [{k: r[k] for k in ("repo", "path", "commit", "lang", "content")} for r in recs]
            )

    rng_df = spark.range(n_files, numPartitions=partitions)
    df = rng_df.mapInPandas(gen, schema=SOURCE_SCHEMA)
    # lineage invariant: content_sha travels with every derived row
    # (BASELINE.json input_hint; checked end-to-end in tests)
    return df.withColumn("content_sha", F.sha2(F.col("content"), 256))


def gold_mentions(spark: SparkSession, n_files: int, seed: int = SEED,
                  partitions: int | None = None) -> DataFrame:
    """Gold mention table derived from the same deterministic grammar."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                r = make_file(int(i), seed)
                for (sent_id, begin, end, text, etype) in r["mentions"]:
                    rows.append(
                        {
                            "repo": r["repo"],
                            "path": r["path"],
                            "commit": r["commit"],
                            "sent_id": sent_id,
                            "begin": begin,
                            "end": end,
                            "text": text,
                            "etype": etype,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "repo", "path", "commit", "sent_id",
                    "begin", "end", "text", "etype",
                ],
            )

    return spark.range(n_files, numPartitions=partitions).mapInPandas(
        gen, schema=GOLD_MENTION_SCHEMA
    )


def stage_source_parquet(spark: SparkSession, n_files: int, path: str,
                         seed: int = SEED, partitions: int | None = None) -> str:
    """Materialize the synthetic source table to parquet once (idempotent:
    skipped when the marker matches).  Benchmarks time the PIPELINE over
    a real columnar scan — the deployment shape — not the generator."""
    import os

    marker = os.path.join(path, "_STAGED")
    tag = f"{n_files}:{seed}"
    try:
        with open(marker) as f:
            if f.read() == tag:
                return path
    except OSError:
        pass
    source_table(spark, n_files, seed, partitions).write.mode("overwrite").parquet(path)
    with open(marker, "w") as f:
        f.write(tag)
    return path
