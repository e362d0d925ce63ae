"""S14/S15 exact converter rules: People's-Daily bracketed-compound +
adjacent-nr merge, Boson {{type:text}} annotation parsing.

The People's-Daily spec is checked against a test-local python
re-statement of the documented rules (the reference corpus itself is
not shipped); the Boson operator is checked against the reference's
OWN shipped output file (data/boson_ner/wordtag.txt, read read-only as
data) — true output parity, not a re-derivation.
"""

from __future__ import annotations

import os
import random

import pytest

from ner_funtool_spark.sources.corpus import (
    BOSON_SPLIT_PUNCTS,
    boson_char_tags,
    renmin_char_bme,
    renmin_merge_tokens,
    split_tagged_sentences,
)

BOSON_DIR = "/root/reference/data/boson_ner"


def _spec_merge(tokens: list[str]) -> list[str]:
    """Test-local restatement of originHandle (data_renmin_word.py:11-36)."""
    out, i = [], 0
    while i < len(tokens):
        t = tokens[i]
        if t == "":
            i += 1
            continue
        if t.startswith("["):
            buf = t.split("/")[0][1:]
            i += 1
            while i < len(tokens) and "]" not in tokens[i]:
                if tokens[i] != "":
                    buf += tokens[i].split("/")[0]
                i += 1
            if i < len(tokens):
                w, g = tokens[i].split("/")[0], tokens[i].split("/")[1]
                out.append(buf + w.strip() + "/" + g[-2:])
        elif t.split("/")[1] == "nr":
            w = t.split("/")[0]
            if i + 1 < len(tokens) and tokens[i + 1] != "" \
                    and tokens[i + 1].split("/")[1] == "nr":
                out.append(w + tokens[i + 1].split("/")[0] + "/nr")
                i += 1
            else:
                out.append(w + "/nr")
        else:
            out.append(t)
        i += 1
    return out


def _line(tokens: list[str]) -> str:
    """File-format line: date id first, trailing separator (the
    reference's loop skips index 0 and the last split element)."""
    return "  ".join(["19980101-01-001-001/m"] + tokens + [""])


def test_renmin_compound_and_nr_merge(spark):
    cases = [
        ["[中国/ns", "政府/n]nt", "主席/n", "江/nr", "泽民/nr", "发表/v"],
        ["江/nr", "主席/n"],                      # lone nr flushes
        ["王/nr"],                                 # nr at line end
        ["[香港/ns", "特别/a", "行政区/n]ns", "好/a"],
        ["江/nr", "泽民/nr", "李/nr", "鹏/nr"],   # two merged pairs
        ["李/nr", "[北京/ns", "大学/n]nt"],       # nr flushed before '['
    ]
    df = spark.createDataFrame(
        [(i, _line(t)) for i, t in enumerate(cases)], "line_id long, line string"
    )
    got = {r["line_id"]: r["toks"] for r in renmin_merge_tokens(df).collect()}
    for i, toks in enumerate(cases):
        assert got[i] == _spec_merge(toks), f"case {i}"
    assert got[0] == ["中国政府/nt", "主席/n", "江泽民/nr", "发表/v"]
    assert got[2] == ["王/nr"]
    assert got[4] == ["江泽民/nr", "李鹏/nr"]


def test_renmin_merge_randomized_vs_spec(spark):
    rng = random.Random(7)
    pool_w = ["中", "国", "华", "大", "学", "人", "民"]
    pool_t = ["n", "v", "nr", "ns", "nt", "a"]
    cases = []
    for _ in range(40):
        toks, j = [], 0
        while j < 8:
            if rng.random() < 0.2:
                k = rng.randint(2, 3)
                inner = [f"{rng.choice(pool_w)}/{rng.choice(['n', 'a'])}" for _ in range(k)]
                inner[0] = "[" + inner[0]
                inner[-1] += "]" + rng.choice(["nt", "ns"])  # w/a]nt form
                toks += inner
                j += k
            else:
                toks.append(f"{rng.choice(pool_w)}/{rng.choice(pool_t)}")
                j += 1
        cases.append(toks)
    df = spark.createDataFrame(
        [(i, _line(t)) for i, t in enumerate(cases)], "line_id long, line string"
    )
    got = {r["line_id"]: r["toks"] for r in renmin_merge_tokens(df).collect()}
    for i, toks in enumerate(cases):
        assert got[i] == _spec_merge(toks), f"case {i}: {toks}"


def test_renmin_char_bme_single_char_quirk(spark):
    df = spark.createDataFrame(
        [(0, ["中国政府/nt", "好/a", "王/nr"])], "line_id long, toks array<string>"
    )
    r = renmin_char_bme(df).first()
    # 4-char nt -> B M M E; plain word -> O; 1-char nr -> char TWICE (quirk)
    assert r["chars"] == ["中", "国", "政", "府", "好", "王", "王"]
    assert r["tags"] == ["B_nt", "M_nt", "M_nt", "E_nt", "O", "B_nr", "E_nr"]


@pytest.mark.skipif(not os.path.exists(f"{BOSON_DIR}/origindata.txt"),
                    reason="reference boson corpus not present")
def test_boson_matches_reference_shipped_output(spark):
    """Run the operator on the reference's shipped raw corpus and
    compare the reconstruction char/tag-token-for-token against the
    reference's OWN wordtag.txt for the first 40 lines."""
    with open(f"{BOSON_DIR}/origindata.txt", encoding="utf-8") as f:
        raw = [next(f) for _ in range(40)]
    with open(f"{BOSON_DIR}/wordtag.txt", encoding="utf-8") as f:
        want = [next(f).rstrip("\n") for _ in range(40)]
    df = spark.createDataFrame(
        list(enumerate(raw)), "line_id long, line string"
    )
    got = {r["line_id"]: (r["chars"], r["tags"])
           for r in boson_char_tags(df).collect()}
    for i in range(40):
        chars, tags = got[i]
        recon = "".join(f"{c}/{t} " for c, t in zip(chars, tags))
        assert recon == want[i], f"line {i}"


def test_split_tagged_sentences(spark):
    df = spark.createDataFrame(
        [(0, list("周恩来，好。王"), ["B_nr", "M_nr", "E_nr", "O", "O", "O", "B_nr"])],
        "line_id long, chars array<string>, tags array<string>",
    )
    got = {r["sent_id"]: (r["chars"], r["tags"])
           for r in split_tagged_sentences(df).collect()}
    assert got[0] == (["周", "恩", "来"], ["B_nr", "M_nr", "E_nr"])
    assert got[1] == (["好"], ["O"])
    assert got[2] == (["王"], ["B_nr"])
    # drop_all_o keeps only entity-bearing sentences
    kept = split_tagged_sentences(df, drop_all_o=True).count()
    assert kept == 2
    # a tagged (non-O) punctuation char must NOT split
    df2 = spark.createDataFrame(
        [(0, list("‘好’"), ["B_x", "M_x", "E_x"])],
        "line_id long, chars array<string>, tags array<string>",
    )
    assert split_tagged_sentences(df2, puncts=BOSON_SPLIT_PUNCTS).count() == 1


MSRA_DIR = "/root/reference/data/msra_ner"


def _spec_msra_wordtag(line: str) -> list[tuple[str, str]]:
    """Test-local restatement of train2pkl.wordtag()
    (data/msra_ner/train2pkl.py:8-39)."""
    out = []
    for word in line.strip().split():
        w, t = word.split("/")[0], word.split("/")[1]
        if t != "o":
            if len(w) == 1:
                out.append((w, "B_" + t))
            else:
                out.append((w[0], "B_" + t))
                for j in w[1:-1]:
                    out.append((j, "M_" + t))
                out.append((w[-1], "E_" + t))
        else:
            for j in w:
                out.append((j, "o"))
    return out


@pytest.mark.skipif(not os.path.exists(f"{MSRA_DIR}/testright1.txt"),
                    reason="reference msra corpus not present")
def test_msra_wordtag_converter_on_shipped_corpus(spark):
    """S13 exact-rule check on the reference's REAL shipped corpus
    (read-only as data): wordtag_to_char_bio == the train2pkl.wordtag
    rule, line by line, for the first 100 non-empty lines."""
    from ner_funtool_spark.sources.corpus import wordtag_to_char_bio

    with open(f"{MSRA_DIR}/testright1.txt", encoding="utf-8") as f:
        lines = [ln for ln in (next(f) for _ in range(120)) if ln.strip()][:100]
    df = spark.createDataFrame(
        list(enumerate(lines)), "line_id long, line string"
    )
    got = {r["line_id"]: list(zip(r["chars"], r["tags"]))
           for r in wordtag_to_char_bio(df).collect()}
    for i, ln in enumerate(lines):
        assert got[i] == _spec_msra_wordtag(ln), f"line {i}"
