"""Corpus readers + dictionary builders (SURVEY.md §2.1 S1-S16, §2.5 A1-A2).

The reference's input universe, re-expressed as DataFrame plans:

* blank-line-delimited ``char<TAB>TAG`` sentence TSV
  (public_tools/data_preprocess.py:18-74, run_bert_crf.py:242-293):
  running blank-line counter over a window -> groupBy sentence.
* multitask variant: ``B-ORG`` split at '-' into boundary + type
  (public_tools/data_preprocess_multitask.py:55-70).
* CLUE JSON lines ``{"text", "label": {type: {word: [[s,e]]}}}``
  (data/clue_ner/data_trans.py:11-60): spans -> per-char BMES-O tags
  (``S-`` for singletons, else B/M.../E) and the reverse direction for
  the submit sink (predict_bert_wol.py:204-221) — round-trip tested.
* aligned seq-file pairs (data/others_ner/*: input.seq.char +
  output.seq.bioattr, ``[SPA]`` for literal space).
* vocab build with digit/latin folding and min-count filter
  (data_preprocess.py:77-113) and tag-dictionary derivation (:64-73).

Ordering note: line order inside a text file is reconstructed with
monotonically_increasing_id, whose (partition, offset) layout follows
split order for contiguous file splits — exact for the file sizes these
corpora come in; at 100 TB the payload rides in the table itself (one
row per record), not in line adjacency, so this path never scales-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ordered_lines(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).withColumn("fid", F.monotonically_increasing_id())


def read_tagged_tsv(spark: SparkSession, path: str,
                    multitask: bool = False) -> DataFrame:
    """Blank-line-delimited char\\tTAG -> (sent_id, chars, tags[, bmeo, attr])."""
    lines = _ordered_lines(spark, path)
    w = Window.orderBy("fid")
    blank = F.when(F.length(F.trim("value")) == 0, 1).otherwise(0)
    sent = lines.withColumn("sent_id", F.sum(blank).over(w)).filter(
        F.length(F.trim("value")) > 0
    )
    parts = F.split(F.col("value"), "\t")
    tok = sent.select(
        "sent_id",
        "fid",
        F.element_at(parts, 1).alias("ch"),
        F.element_at(parts, 2).alias("tag"),
    )
    agg = tok.groupBy("sent_id").agg(
        F.array_sort(F.collect_list(F.struct("fid", "ch", "tag"))).alias("xs")
    )
    out = agg.select(
        "sent_id",
        F.transform("xs", lambda x: x["ch"]).alias("chars"),
        F.transform("xs", lambda x: x["tag"]).alias("tags"),
    )
    if multitask:
        # 'B-ORG' -> ('B', 'ORG'); 'O' -> ('O', 'O')
        out = out.withColumn(
            "bmeo",
            F.transform("tags", lambda t: F.element_at(F.split(t, "-"), 1)),
        ).withColumn(
            "attr",
            F.transform(
                "tags",
                lambda t: F.when(t.contains("-"), F.element_at(F.split(t, "-"), 2)).otherwise("O"),
            ),
        )
    return out


CLUE_SCHEMA = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField(
        "label",
        T.MapType(
            T.StringType(),
            T.MapType(T.StringType(), T.ArrayType(T.ArrayType(T.IntegerType()))),
        ),
    ),
])


def read_clue_json(spark: SparkSession, path: str) -> DataFrame:
    """CLUE JSONL -> (line_id, text, label) with explicit schema."""
    df = spark.read.schema(CLUE_SCHEMA).json(path)
    return df.withColumn("line_id", F.monotonically_increasing_id())


def clue_spans(clue: DataFrame) -> DataFrame:
    """label map -> one row per span: (line_id, etype, word, s, e).

    Spans are inclusive [s, e] char offsets (data_trans.py:38-60).
    """
    return (
        clue.select(
            "line_id", "text", F.explode(F.map_entries("label")).alias("t")
        )
        .select(
            "line_id", "text",
            F.col("t.key").alias("etype"),
            F.explode(F.map_entries("t.value")).alias("w"),
        )
        .select(
            "line_id", "text", "etype",
            F.col("w.key").alias("word"),
            F.explode("w.value").alias("span"),
        )
        .select(
            "line_id", "text", "etype", "word",
            F.element_at("span", 1).alias("s"),
            F.element_at("span", 2).alias("e"),
        )
    )


def clue_tags(clue: DataFrame) -> DataFrame:
    """spans -> per-char BMES-O tag array (S- singleton, else B..M..E),
    matching data_trans.py:50-56.  Pure column expressions: a position
    map from exploded spans, then a sequence transform."""
    sp = clue_spans(clue)
    pos_tag = sp.select(
        "line_id",
        F.explode(F.sequence("s", "e")).alias("pos"),
        F.when(F.col("s") == F.col("e"), F.concat(F.lit("S-"), "etype"))
        .when(F.col("pos") == F.col("s"), F.concat(F.lit("B-"), "etype"))
        .when(F.col("pos") == F.col("e"), F.concat(F.lit("E-"), "etype"))
        .otherwise(F.concat(F.lit("M-"), "etype"))
        .alias("tag"),
    )
    maps = pos_tag.groupBy("line_id").agg(
        F.map_from_entries(F.collect_list(F.struct("pos", "tag"))).alias("m")
    )
    all_o = F.array_repeat(F.lit("O"), F.length("text"))
    from_map = F.transform(
        F.sequence(F.lit(0), F.length("text") - 1),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit("O")),
    )
    return clue.join(maps, "line_id", "left").select(
        "line_id",
        "text",
        F.when(F.col("m").isNull(), all_o).otherwise(from_map).alias("tags"),
    )


def tags_to_clue_label(tagged: DataFrame, text_col: str = "text",
                       tags_col: str = "tags") -> DataFrame:
    """Reverse direction (K5 submit sink): per-char BMES tags -> the
    CLUE label map, via the relational run-grouping (same shape as
    operators/mentions_sql.py) + nested map assembly."""
    t = tagged.select(
        "line_id",
        F.col(text_col).alias("text"),
        F.posexplode(tags_col).alias("pos", "tag"),
    ).withColumn("etype", F.when(F.col("tag") != "O", F.substring("tag", 3, 1000)))
    w = Window.partitionBy("line_id").orderBy("pos")
    runs = (
        t.withColumn(
            "brk",
            F.when(
                F.col("etype").eqNullSafe(F.lag("etype").over(w))
                & ~F.col("tag").startswith("B-")
                & ~F.col("tag").startswith("S-")
                & ~F.coalesce(F.lag("tag").over(w), F.lit("")).startswith("S-")
                & ~F.coalesce(F.lag("tag").over(w), F.lit("")).startswith("E-"),
                0,
            ).otherwise(1),
        )
        .withColumn("gid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(F.col("etype").isNotNull())
    )
    spans = runs.groupBy("line_id", "gid", "etype").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e"), F.first("text").alias("text")
    ).withColumn("word", F.expr("substring(text, s + 1, e - s + 1)"))
    words = spans.groupBy("line_id", "etype", "word").agg(
        F.collect_list(F.array("s", "e")).alias("locs")
    )
    per_type = words.groupBy("line_id", "etype").agg(
        F.map_from_entries(F.collect_list(F.struct("word", "locs"))).alias("wm")
    )
    return per_type.groupBy("line_id").agg(
        F.map_from_entries(F.collect_list(F.struct("etype", "wm"))).alias("label")
    )


def read_seq_files(spark: SparkSession, char_path: str, tag_path: str) -> DataFrame:
    """Aligned line-per-sentence files -> (sent_id, chars, tags);
    ``[SPA]`` unescapes to a literal space (data/others_ner format)."""
    a = _ordered_lines(spark, char_path).select(
        F.col("fid").alias("sent_id"),
        F.transform(
            F.split("value", " "),
            lambda c: F.when(c == "[SPA]", " ").otherwise(c),
        ).alias("chars"),
    )
    b = _ordered_lines(spark, tag_path).select(
        F.col("fid").alias("sent_id"), F.split("value", " ").alias("tags")
    )
    return a.join(b, "sent_id")


def wordtag_to_char_bio(df: DataFrame, text_col: str = "line",
                        sep: str = "/") -> DataFrame:
    """MSRA-style converter (S13, data/msra_ner/train2pkl.py:8-39):
    ``word/tag`` tokens -> per-char tags.  Exactly the reference's rule:
    single-char word -> ``B_tag`` alone; 2+ chars -> ``B_ (M_)* E_``;
    tag ``o`` -> lowercase ``o`` per char (the reference writes '/o').
    Pure column expressions (flatten of a nested transform).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    word = lambda t: F.element_at(F.split(t, sep), 1)  # noqa: E731
    tag = lambda t: F.element_at(F.split(t, sep), 2)  # noqa: E731

    def char_tags(t):
        w, g = word(t), tag(t)
        n = F.length(w)
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(g == "o", "o")
            .when(i == 1, F.concat(F.lit("B_"), g))
            .when(i == n, F.concat(F.lit("E_"), g))
            .otherwise(F.concat(F.lit("M_"), g)),
        )

    chars = F.flatten(
        F.transform(
            toks,
            lambda t: F.transform(
                F.sequence(F.lit(1), F.length(word(t))),
                lambda i: word(t).substr(i, F.lit(1)),
            ),
        )
    )
    tags = F.flatten(F.transform(toks, char_tags))
    return df.withColumn("chars", chars).withColumn("tags", tags)


def vocab_build(corpus: DataFrame, chars_col: str = "chars",
                min_count: int = 1) -> DataFrame:
    """Char-frequency vocab with the reference's folding rules
    (data_preprocess.py:77-113): digits -> <NUM>, latin -> <ENG>, drop
    below min_count (folded specials always kept), ids by frequency
    desc then char asc (deterministic rank)."""
    folded = corpus.select(F.explode(chars_col).alias("ch")).select(
        F.when(F.col("ch").rlike("^[0-9]$"), "<NUM>")
        .when(F.col("ch").rlike("^[A-Za-z]$"), "<ENG>")
        .otherwise(F.col("ch"))
        .alias("ch")
    )
    counts = folded.groupBy("ch").agg(F.count("*").alias("freq"))
    kept = counts.filter(
        (F.col("freq") >= min_count) | F.col("ch").isin("<NUM>", "<ENG>")
    )
    w = Window.orderBy(F.desc("freq"), F.asc("ch"))
    return kept.select(
        "ch", "freq", (F.row_number().over(w)).alias("id")
    )


def tag_dictionary(corpus: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Distinct tags -> dense ids, O first then lexicographic
    (derivation rule of data_preprocess.py:64-73 made deterministic)."""
    tags = corpus.select(F.explode(tags_col).alias("tag")).distinct()
    w = Window.orderBy(F.when(F.col("tag") == "O", 0).otherwise(1), F.asc("tag"))
    return tags.select("tag", (F.row_number().over(w) - 1).alias("id"))


def load_dict_broadcast(spark: SparkSession, df: DataFrame,
                        key: str, value: str):
    """Small dimension -> broadcast python dict (S7/S8 loaders)."""
    d = {r[key]: r[value] for r in df.collect()}
    return spark.sparkContext.broadcast(d)
