"""Global deterministic configuration: seeds, dims, tag inventories.

The reference derives its tag inventory from ``tag2label.txt`` files
(reference: run_bert_crf.py:295-307, data/clue_ner/tag2label.txt) and its
cascade inventories from ``bmeo2label.txt`` / ``attr2label.txt``
(reference: run_multitask_bert_crf.py:322-345).  We keep the same BMES-O
scheme but parameterize the entity-type set per domain.
"""

from __future__ import annotations

SEED = 20260816

# -- model dims (reference uses 768-d frozen char embeddings + 300 hidden;
#    model_lstm_crf.py:23-40.  Fixtures shrink dims, rules identical.) --
EMBED_DIM = 32
HIDDEN_DIM = 32

# -- BMES-O tagging scheme (reference: data/clue_ner/tag2label.txt,
#    public_tools/data_preprocess_multitask.py:55-70) --
BOUNDARIES = ["B", "M", "E", "S"]  # + "O"

# entity types for the source-code domain (north_star: functions,
# classes, imports/modules, packages)
CODE_ETYPES = ["func", "class", "module", "package"]

# entity types for the word-soup `documents` domain (driver testdata):
# consecutive runs of same-class tokens form one entity.
DOC_ETYPES = ["op", "obj"]
DOC_OP_WORDS = (
    "join", "merge", "sort", "scan", "filter", "group", "agg", "hash",
)
DOC_OBJ_WORDS = (
    "table", "row", "column", "key", "part", "batch", "stream", "line",
    "value", "data", "window",
)

# perturbed class lists: stand in for a second model's predictions so
# the metric operators (A3-A12) have non-trivial P/R to compute
DOC_OP_WORDS_ALT = ("join", "merge", "sort", "scan", "filter", "group", "agg", "query")
DOC_OBJ_WORDS_ALT = (
    "table", "row", "column", "key", "part", "batch", "stream", "line",
    "value", "data", "vector",
)

PAD = "<PAD>"
UNK = "<UNK>"


def tagset(etypes: list[str]) -> list[str]:
    """Full BMES-O tag list, O first (id 0), then B-/M-/E-/S- per type.

    Mirrors the reference's tag2label layout where O maps to a fixed id
    and composite tags follow (data/clue_ner/tag2label.txt).
    """
    tags = ["O"]
    for t in etypes:
        for b in BOUNDARIES:
            tags.append(f"{b}-{t}")
    return tags
