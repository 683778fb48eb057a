"""Unicode contract pins for the text root (tokens / fingerprint).

The r8 primitive probe compared Spark and DuckDB on adversarial text:
NBSP / ideographic space / ZWSP / CRLF / fullwidth / emoji-ZWJ /
combining marks / regex metacharacters all agree between engines. Three
cases DIVERGE at the primitive level and therefore bound the ORACLE's
domain (the engine's behavior is the contract; DuckDB is the checker):

- Turkish dotted capital İ: Java lowercases to 'i' + COMBINING DOT
  ABOVE (U+0069 U+0307, the Unicode-correct mapping); DuckDB folds to
  plain 'i'.
- Greek capital sigma Σ in final position: Java applies the
  context-sensitive final-sigma rule (ς); DuckDB always emits σ.
- Vertical tab U+000B: Java regex \\s includes it; RE2's does not, so
  tokenization splits differently.

These tests PIN the Spark-side behavior so an engine upgrade that
changes the mapping is caught; the fixture text stays out of the
oracle-compared corpora by design (documented in tools/null_sweep.py's
sibling note in COVERAGE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _tok_fp(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        F.filter(
            F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != ""
        ).alias("toks"),
        F.md5(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        ).alias("fp"),
    ).collect()[0]
    return list(row["toks"]), row["fp"]


def test_turkish_dotted_i_lowers_with_combining_dot(spark):
    toks, _ = _tok_fp(spark, "İstanbul")
    assert toks == ["i̇stanbul"]  # U+0069 U+0307, not plain 'i'


def test_greek_final_sigma_rule_applies(spark):
    toks, _ = _tok_fp(spark, "ΟΔΥΣΣΕΥΣ")
    assert toks == ["οδυσσευς"]  # trailing ς, context-sensitive


def test_vertical_tab_is_token_whitespace(spark):
    toks, _ = _tok_fp(spark, "a\x0bb\x0cc")
    assert toks == ["a", "b", "c"]  # Java \s covers \x0B and \x0C


def test_benign_unicode_is_engine_stable(spark):
    """The cases the probe showed AGREE across engines: normalizing them
    must keep producing the same fingerprints (a tokenizer change that
    breaks NBSP/ZWJ/fullwidth handling shows up here)."""
    cases = {
        "a b c": 2,          # NBSP binds - not \s in either engine
        "a　b": 1,            # ideographic space neither
        "a​b c": 2,          # ZWSP binds
        "a\r\nb\tc": 3,
        "ＡＢＣ def": 2,  # fullwidth letters lower in place
        "\U0001f469‍\U0001f680 x": 2,  # emoji ZWJ sequence intact
    }
    for text, n in cases.items():
        toks, fp = _tok_fp(spark, text)
        assert len(toks) == n, (text, toks)
        assert len(fp) == 32
