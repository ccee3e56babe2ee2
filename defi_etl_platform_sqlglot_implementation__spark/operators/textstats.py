"""Text analysis operators (scale extension): language ID, quality scoring,
token counting, fingerprinting.

All pure column expressions (codegen, no UDFs); every ratio is an exact
integer division expressed with identical operation order so a SQL oracle
reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# marker-substring frequency heuristics per language
LANG_MARKERS = {
    "en": " the ",
    "de": " der ",
    "fr": " le ",
    "es": " el ",
}


def _count_occurrences(text: Column, marker: str) -> Column:
    """Occurrences of a literal substring: (len - len(remove(marker))) / len(marker)."""
    removed = F.replace(text, F.lit(marker), F.lit(""))
    return ((F.length(text) - F.length(removed)) / F.lit(len(marker))).cast("long")


def token_count(text: Column) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


def text_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality stats: lengths, word/token counts, ratios, score."""
    text = F.col(text_col)
    words = F.split(text, " ")
    n_words = F.size(words)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_space = F.length(F.regexp_replace(text, "[^ ]", ""))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    alpha_ratio = n_alpha.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_words
    avg_word_len = (n_chars - n_space).cast("double") / n_words
    quality = (
        alpha_ratio * 0.4
        + stop_ratio * 0.3
        + F.least(F.lit(1.0), n_words.cast("double") / 50) * 0.3
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        token_count(text).alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_word_len.alias("avg_word_len"),
        quality.alias("quality_score"),
    )


def token_entropy(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy (nats) of each document's token distribution plus a
    normalized diversity ratio — the repetition signal LLM curation uses to
    drop template/boilerplate docs (low entropy ⇒ few distinct tokens
    dominate).

    Entirely in-row: distinct tokens via ``array_distinct`` (first-
    occurrence order — the oracle must sum in a fixed order too, so both
    sides sort the distinct list before folding), per-token counts via a
    ``transform``+``filter`` nested loop (O(distinct·n) per row — fine for
    document-sized arrays), and the -Σ p·ln p fold via ``aggregate``. No
    explode, no shuffle: entropy over 100 TB is scan-speed.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # sorted distinct tokens => deterministic, engine-agnostic fold order
    counts = F.expr(
        f"transform(array_sort(array_distinct(split({text_col}, ' '))),"
        f" t -> size(filter(split({text_col}, ' '), x -> x = t)))"
    )
    entropy = F.expr(
        f"-aggregate(transform(array_sort(array_distinct(split({text_col}, ' '))),"
        f"  t -> size(filter(split({text_col}, ' '), x -> x = t))),"
        f" cast(0.0 as double),"
        f" (acc, c) -> acc + (cast(c as double) / size(split({text_col}, ' ')))"
        f"   * ln(cast(c as double) / size(split({text_col}, ' '))))"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.size(counts).cast("long").alias("n_distinct"),
        entropy.alias("entropy"),
        (F.size(counts).cast("double") / n).alias("diversity"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-frequency language guess with deterministic argmax order."""
    text = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    counts = {lang: _count_occurrences(text, m) for lang, m in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.lit("unknown")
    best_cnt = F.lit(0).cast("long")
    # with strict '>', the first language to set best wins ties — iterate
    # in priority order (en > de > fr > es), matching the oracle's CASE
    for lang in langs:
        cond = counts[lang] > best_cnt
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_cnt = F.when(cond, counts[lang]).otherwise(best_cnt)
    sel = [F.col(id_col).alias("doc_id")]
    sel += [counts[lang].alias(f"n_{lang}") for lang in langs]
    sel.append(best.alias("lang_pred"))
    return docs.select(*sel)


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalization fingerprint: md5 of lowercased whitespace-collapsed text."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "[ ]+", " "))
    fp = F.md5(F.encode(norm, "UTF-8"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
    )
