"""ROUND-digits lint: flag ROUND(x, n) / F.round(x, n) with n > 9 on
unbounded statistics.

Why this rule exists (learned the hard way, commit 262a8a2): a double
has ~15-16 significant DECIMAL DIGITS TOTAL, not after the point.  For
a statistic of magnitude ~1e3, ROUND(x, 12) asks for 15-16 significant
digits — at the representation edge, where Spark and DuckDB legally
disagree in the last ulp and the oracle hash flips at one SF but not
another (q_did/q_cuped diverged only at sf0.1).  Keeping rounded
oracle-checked values to <= 9 fractional digits leaves headroom for
any statistic up to ~1e6 magnitude.

Exemption: statistics PROVABLY bounded in [-1, 1] (correlations,
cosine similarities, R^2, rates) carry at most 1 integer digit, so
even 12 fractional digits stay within double precision.  Exempt sites
are declared in ``BOUNDED_EXEMPT`` below — adding one requires writing
down WHY the value is bounded.

Used two ways:
  * ``python tools/round_lint.py`` — scan the engine sources, exit 1
    on violations (CI-style).
  * ``tests/test_round_lint.py`` — runs the scan in pytest and also
    seeds a violation to prove the lint catches it.
"""

from __future__ import annotations

import re
import sys
from dataclasses import dataclass
from pathlib import Path

MAX_DIGITS = 9

# (file-suffix, regex matched against the violation's source snippet).
# Every entry documents why the rounded value is bounded in [-1, 1]
# (and therefore never exceeds ~13 significant digits at 12 fractional).
BOUNDED_EXEMPT: list[tuple[str, str, str]] = [
    (
        "operators/relational.py",
        r'alias\("r2"\)',
        "R^2 is bounded in [0, 1] by Cauchy-Schwarz",
    ),
    (
        "operators/relational.py",
        r'alias\("corr"\)',
        "Pearson correlation is bounded in [-1, 1] by Cauchy-Schwarz",
    ),
    (
        "queries.py",
        r"AS corr",
        "oracle mirror of the Pearson correlation — bounded in [-1, 1]",
    ),
    (
        "queries.py",
        r"AS r2",
        "oracle mirror of R^2 — bounded in [0, 1]",
    ),
]

_ROUND_RE = re.compile(r"(?i)(?<![\w.])(?:F\s*\.\s*)?round\s*\(")


@dataclass
class RoundCall:
    """One ROUND(...) call site found in a source blob."""

    path: str
    line: int
    digits: int
    snippet: str


def _strip_comments(blob: str) -> str:
    """Blank out '#'-to-end-of-line comments that sit OUTSIDE string
    literals (replacing them with spaces preserves every offset and
    line number). Without this, a comment containing an unbalanced
    '(' or a ',' inside a multi-line round(...) call corrupts the
    arg parser and a violation silently passes — a false negative in
    the lint gate.

    Uses Python's own tokenizer (ADVICE r10): the previous hand-rolled
    character scanner did not understand triple-quoted strings, so a
    docstring or oracle SQL containing an odd number of quote
    characters (e.g. the quoted identifier "precision" in
    _CLASS_REPORT_ORACLE) desynced its in-string state and could blank
    a '#' inside a string or leave a real comment unstripped. The
    tokenizer knows the real grammar; string contents (where the
    oracle SQL lives and must keep being scanned) pass through
    untouched. On a tokenization error (non-Python text fed to the
    library API) the blob is returned unchanged — for .py engine
    sources a failure would mean the file does not import at all,
    which the test suite catches long before this lint."""
    import io
    import tokenize

    # offset of each line start, so (row, col) spans map to indices
    line_starts = [0]
    for idx, ch in enumerate(blob):
        if ch == "\n":
            line_starts.append(idx + 1)
    out = list(blob)
    try:
        for tok in tokenize.generate_tokens(io.StringIO(blob).readline):
            if tok.type != tokenize.COMMENT:
                continue
            srow, scol = tok.start
            erow, ecol = tok.end
            a = line_starts[srow - 1] + scol
            b = line_starts[erow - 1] + ecol
            for k in range(a, min(b, len(out))):
                out[k] = " "
    except (tokenize.TokenError, SyntaxError):
        # TokenError is the real tokenize failure class (ADVICE r11:
        # TokenizeError does not exist, so the fallback itself raised
        # AttributeError); IndentationError is a SyntaxError subclass.
        return blob
    return "".join(out)


def _top_level_args(blob: str, open_idx: int) -> tuple[list[str], int]:
    """Split the argument list of the call whose '(' is at open_idx
    into top-level comma-separated args; return (args, close_idx).
    Handles nested parens/brackets and string literals (escapes
    consumed pairwise, so a trailing '\\\\' before a quote does not
    un-terminate the string)."""
    depth = 0
    args: list[str] = []
    cur: list[str] = []
    i = open_idx
    n = len(blob)
    in_str: str | None = None
    while i < n:
        ch = blob[i]
        if in_str:
            cur.append(ch)
            if ch == "\\" and i + 1 < n:
                cur.append(blob[i + 1])
                i += 2  # consume the escape pair atomically
                continue
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in "'\"":
            in_str = ch
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            if depth > 1:
                cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            if depth == 0:
                args.append("".join(cur).strip())
                return args, i
            cur.append(ch)
        elif ch == "," and depth == 1:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    return args, n  # unbalanced — caller treats as no-digits


def find_round_calls(blob: str, path: str = "<str>") -> list[RoundCall]:
    """Every round(...) call in ``blob`` whose LAST top-level argument
    is an integer literal (the digits arg)."""
    blob = _strip_comments(blob)
    out: list[RoundCall] = []
    for m in _ROUND_RE.finditer(blob):
        open_idx = blob.index("(", m.start())
        args, close = _top_level_args(blob, open_idx)
        if args and args[-1] == "":
            args.pop()  # idiomatic trailing comma in a multi-line call
        if len(args) < 2:
            continue  # ROUND(x) — digits defaults to 0, always fine
        last = args[-1]
        if not re.fullmatch(r"[+-]?\d+", last):
            continue  # non-literal digits: out of scope for the lint
        if any("…" in a or a == "..." for a in args):
            continue  # prose mention in a docstring, not a call
        line = blob.count("\n", 0, m.start()) + 1
        snippet = blob[m.start() : min(close + 80, len(blob))]
        out.append(
            RoundCall(
                path=path, line=line, digits=int(last), snippet=snippet
            )
        )
    return out


def find_violations(blob: str, path: str = "<str>") -> list[RoundCall]:
    """ROUND calls with digits > MAX_DIGITS not covered by a
    BOUNDED_EXEMPT entry."""
    bad = []
    for call in find_round_calls(blob, path):
        if call.digits <= MAX_DIGITS:
            continue
        exempt = any(
            call.path.endswith(suffix) and re.search(pat, call.snippet)
            for suffix, pat, _why in BOUNDED_EXEMPT
        )
        if not exempt:
            bad.append(call)
    return bad


def scan_engine(repo_root: Path | None = None) -> list[RoundCall]:
    """Scan every engine source file (queries.py carries the oracle
    SQL strings, so scanning .py text covers BOTH the Spark side and
    the DuckDB side)."""
    root = repo_root or Path(__file__).resolve().parent.parent
    violations: list[RoundCall] = []
    for py in sorted((root / "h3_indexer_spark").rglob("*.py")):
        rel = str(py.relative_to(root))
        violations.extend(find_violations(py.read_text(), rel))
    return violations


def main() -> int:
    violations = scan_engine()
    for v in violations:
        head = v.snippet.splitlines()[0]
        print(
            f"{v.path}:{v.line}: ROUND digits={v.digits} > {MAX_DIGITS} "
            f"on (possibly) unbounded statistic: {head}"
        )
    if violations:
        print(
            f"\n{len(violations)} violation(s). Either reduce to <= 9 "
            "digits or add a BOUNDED_EXEMPT entry with a boundedness "
            "proof (tools/round_lint.py)."
        )
        return 1
    print("round_lint: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
