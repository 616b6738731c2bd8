"""Mechanical window-scale gate.

Every ``Window.partitionBy`` / ``Window.orderBy`` usage in the package
is a potential single-task bottleneck at 100 TB: a ranking or running
aggregate over an unbounded partition funnels a dominant key through
one window task (measured in SKEW_PROBE.json: one hot language put 95%
of shuffled rows through a single ntile task, vs 12.3% for the
two-pass plan). This test automates the previously-manual end-of-round
checklist: each window usage must be justified IN THE CODE by one of

1. the enclosing function exposing a ``method`` parameter with a
   ``"two_pass"`` route (the operators/ranks.py scale spelling), or
2. a literal ``two_pass`` mention in the enclosing function's
   docstring (delegation note), or
3. a ``Window scale:`` marker (docstring or adjacent comment) stating
   why the partition is bounded per task — per-doc / per-key / per-
   query keys, limit()-bounded inputs, sketch-sized frames, or an
   explicit hot-group remediation note.

A new unjustified window fails this test with the file:line of the
usage, which is exactly the review prompt the checklist used to rely
on a human to raise.
"""

from __future__ import annotations

import ast
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "beis_orp_data_service_spark"
TAG = re.compile(r"(?i)window scale:\s*\S")


def _window_violations(src: str, label: str) -> list[str]:
    """All unjustified Window.partitionBy/orderBy usages in ``src``."""
    tree = ast.parse(src)
    out: list[str] = []
    # evasion guard: the scanner keys on the canonical `Window` name, so
    # importing it under an alias would silently skip the check
    for n in ast.walk(tree):
        if isinstance(n, ast.ImportFrom) and "window" in (n.module or ""):
            for a in n.names:
                if a.name == "Window" and a.asname not in (None, "Window"):
                    out.append(
                        f"{label}:{n.lineno} Window imported as alias "
                        f"{a.asname!r} — keep the canonical name so the "
                        "window-scale scan sees every usage"
                    )
    funcs = [
        n
        for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]

    def enclosing(node: ast.AST):
        best = None
        for f in funcs:
            if f.lineno <= node.lineno <= (f.end_lineno or f.lineno):
                if best is None or f.lineno > best.lineno:
                    best = f
        return best

    for n in ast.walk(tree):
        if not (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr in ("partitionBy", "orderBy")
            and isinstance(n.func.value, ast.Name)
            and n.func.value.id == "Window"
        ):
            continue
        f = enclosing(n)
        if f is None:
            out.append(
                f"{label}:{n.lineno} module-level Window usage with no "
                "enclosing function to carry the justification"
            )
            continue
        doc = ast.get_docstring(f) or ""
        fsrc = ast.get_source_segment(src, f) or ""
        has_method = any(
            a.arg == "method"
            for a in list(f.args.args) + list(f.args.kwonlyargs)
        )
        if (
            ("two_pass" in fsrc and has_method)
            or ("two_pass" in doc)
            or TAG.search(fsrc)
        ):
            continue
        out.append(
            f"{label}:{n.lineno} Window.{n.func.attr} in {f.name}() has no "
            "scale justification — add a 'Window scale:' marker arguing "
            "per-task boundedness, or route through a method='two_pass' "
            "spelling (operators/ranks.py)"
        )
    return out


def test_every_package_window_is_justified():
    violations: list[str] = []
    for p in sorted(PKG.rglob("*.py")):
        violations += _window_violations(
            p.read_text(), str(p.relative_to(PKG.parent))
        )
    assert not violations, "\n".join(violations)


def test_scanner_catches_planted_violation():
    planted = (
        "from pyspark.sql import Window\n"
        "def hot(df):\n"
        "    w = Window.partitionBy('lang').orderBy('score')\n"
        "    return df\n"
    )
    hits = _window_violations(planted, "planted.py")
    assert len(hits) == 1 and "hot()" in hits[0], hits


def test_scanner_catches_module_level_and_alias():
    planted = (
        "from pyspark.sql.window import Window as W\n"
        "from pyspark.sql import Window\n"
        "w = Window.orderBy('x')\n"
    )
    hits = _window_violations(planted, "planted.py")
    assert len(hits) == 2, hits
    assert any("alias" in h for h in hits), hits
    assert any("module-level" in h for h in hits), hits


def test_scanner_accepts_each_justification_route():
    tagged = (
        "from pyspark.sql import Window\n"
        "def per_doc(df):\n"
        "    # Window scale: partition key is the doc id; rows per task\n"
        "    # = one document's tokens (bounded).\n"
        "    w = Window.partitionBy('doc_id').orderBy('pos')\n"
        "    return df\n"
    )
    assert _window_violations(tagged, "t.py") == []
    routed = (
        "from pyspark.sql import Window\n"
        "def ranked(df, method='window'):\n"
        "    if method == 'two_pass':\n"
        "        return df\n"
        "    w = Window.partitionBy('lang').orderBy('score')\n"
        "    return df\n"
    )
    assert _window_violations(routed, "t.py") == []
