"""ROUND-digits lint (VERDICT r9 #4): oracle-checked compounds must
not round unbounded statistics past 9 fractional digits — doubles only
carry ~15-16 significant digits TOTAL, so ROUND(~1e3-magnitude, 12)
sits at the representation edge where Spark and DuckDB legally differ
in the last ulp (the q_did/q_cuped sf0.1 divergence, commit 262a8a2).
Bounded-in-[-1,1] statistics are exempt via an allowlist that requires
a written boundedness proof."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.round_lint import (  # noqa: E402
    find_round_calls,
    find_violations,
    scan_engine,
)


class TestLintMechanics:
    def test_seeded_sql_violation_is_caught(self):
        sql = "SELECT ROUND(SUM(x) / COUNT(*), 12) AS m FROM t"
        bad = find_violations(sql, "seed.py")
        assert len(bad) == 1 and bad[0].digits == 12

    def test_seeded_pyspark_violation_is_caught(self):
        src = 'df.select(F.round(F.col("a") * nd - sx * sy, 11).alias("b"))'
        bad = find_violations(src, "seed.py")
        assert len(bad) == 1 and bad[0].digits == 11

    def test_nested_parens_digits_parse(self):
        sql = "ROUND(CAST(FLOOR(a / b) AS DOUBLE) + COALESCE(c, 0), 9)"
        calls = find_round_calls(sql)
        assert [c.digits for c in calls] == [9]

    def test_round_to_9_or_fewer_is_clean(self):
        sql = "SELECT ROUND(x, 9), ROUND(y, 6), ROUND(z, 0) FROM t"
        assert find_violations(sql) == []

    def test_non_literal_digits_is_out_of_scope(self):
        assert find_violations("F.round(x, n_digits)") == []

    def test_exempt_requires_matching_file_and_snippet(self):
        # same snippet, wrong file: NOT exempt
        src = 'F.round(F.when(den > 0, corr * corr), 12).alias("r2")'
        assert find_violations(src, "operators/other.py")
        # right file + snippet: exempt (r2 bounded in [0, 1])
        assert find_violations(src, "operators/relational.py") == []


class TestEngineIsClean:
    def test_no_round_violations_in_engine_sources(self):
        violations = scan_engine(REPO)
        assert violations == [], [
            f"{v.path}:{v.line} digits={v.digits}" for v in violations
        ]


class TestParserHardening:
    """Round-10 review findings: comments and escape sequences must
    not blind the parser (false negatives in a CI gate are worse than
    no gate)."""

    def test_comment_with_unbalanced_paren_does_not_hide_violation(self):
        src = (
            "x = F.round(\n"
            "    expr,  # unbounded stat (see SCALE.md\n"
            "    12,\n"
            ")\n"
        )
        bad = find_violations(src, "seed.py")
        assert len(bad) == 1 and bad[0].digits == 12

    def test_comment_with_comma_does_not_split_args(self):
        src = (
            "x = F.round(\n"
            "    a / b,  # ratio, quantized, see entropy rule\n"
            "    11,\n"
            ")\n"
        )
        bad = find_violations(src, "seed.py")
        assert len(bad) == 1 and bad[0].digits == 11

    def test_hash_inside_string_is_not_a_comment(self):
        # the '#' lives in a SQL string literal — stripping it as a
        # comment would delete the digits arg and hide the violation
        sql = 'q = "SELECT ROUND(x, 12) AS m -- tag #42 FROM t"'
        bad = find_violations(sql, "seed.py")
        assert len(bad) == 1 and bad[0].digits == 12

    def test_escaped_backslash_before_quote_terminates_string(self):
        # "...\\" ends the string; the following round call must parse
        src = 's = "path\\\\"\ny = F.round(z, 13)\n'
        bad = find_violations(src, "seed.py")
        assert len(bad) == 1 and bad[0].digits == 13

    def test_triple_quoted_string_with_odd_quote_count(self):
        # ADVICE r10: a triple-quoted oracle SQL containing an ODD
        # number of quote characters (the quoted identifier
        # "precision") desynced the old character scanner, so a later
        # '#' inside a string could be wrongly blanked or a real
        # comment left unstripped. The tokenizer-based stripper must
        # (a) keep scanning string contents — the seeded violation
        # inside the SQL is caught — and (b) still strip the real
        # comment whose unbalanced '(' would corrupt the arg parser.
        src = (
            '_Q = """\n'
            '    SELECT ROUND(x, 12) AS "precision" FROM t\n'
            '"""\n'
            "# real comment with an unbalanced ( paren\n"
            "y = F.round(z, 11)\n"
        )
        bad = find_violations(src, "seed.py")
        assert sorted(b.digits for b in bad) == [11, 12]

    def test_hash_inside_triple_quoted_string_survives(self):
        # the '#' sits INSIDE a docstring after an odd quote count —
        # the old scanner blanked from it to end-of-line, hiding the
        # in-string violation's digits from the scan
        src = (
            'doc = """the "precision" column # ROUND(x, 12) here"""\n'
        )
        bad = find_violations(src, "seed.py")
        assert len(bad) == 1 and bad[0].digits == 12

    def test_untokenizable_blob_returns_unchanged(self):
        # Regression (round-12): the except clause referenced the
        # nonexistent tokenize.TokenizeError, so an actual tokenize
        # failure raised AttributeError instead of falling back to
        # the documented return-blob-unchanged path. An unterminated
        # triple-quoted string raises tokenize.TokenError.
        from tools.round_lint import _strip_comments

        blob = 'x = """unterminated\n# not a comment inside\n'
        assert _strip_comments(blob) == blob
