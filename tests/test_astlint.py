"""Seeded-defect tests for scripts/astlint.py (the flake8-subset gate).

Each test plants a defect the byte-compile + import-walk check in
scripts/check.py cannot catch (un-executed branches import fine) and
asserts the linter reports it — plus negative tests proving the scope
model doesn't false-positive on the patterns the package actually uses.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
import astlint  # noqa: E402


def codes(src):
    return [(f.code, f.line) for f in astlint.lint_source(src)]


def test_undefined_name_in_unexecuted_branch():
    src = (
        "def f(x):\n"
        "    if x:\n"
        "        return helper(x)\n"  # helper never defined
        "    return 0\n"
    )
    assert ("undefined-name", 3) in codes(src)


def test_undefined_name_typo_in_except():
    src = (
        "import logging\n"
        "log = logging.getLogger()\n"
        "def g():\n"
        "    try:\n"
        "        return 1\n"
        "    except ValueError as err:\n"
        "        log.error('%s', er)\n"  # typo: er
        "        raise\n"
    )
    assert ("undefined-name", 7) in codes(src)


def test_unused_import_flagged():
    src = "import os\nimport json\nprint(json.dumps({}))\n"
    found = codes(src)
    assert ("unused-import", 1) in found
    assert all(c != "unused-import" or ln == 1 for c, ln in found)


def test_future_and_noqa_exempt():
    src = (
        "from __future__ import annotations\n"
        "import os  # noqa\n"
        "x: int = 1\n"
    )
    assert codes(src) == []


def test_duplicate_dict_key():
    src = "d = {'a': 1, 'b': 2, 'a': 3}\n"
    assert ("duplicate-key", 1) in codes(src)


def test_syntax_error_reported():
    assert codes("def f(:\n")[0][0] == "syntax-error"


def test_no_false_positives_on_common_patterns():
    src = (
        "import typing\n"
        "CONST = 1\n"
        "def fact(n: int) -> int:\n"
        "    return 1 if n < 2 else n * fact(n - 1)\n"  # recursion
        "def uses_later():\n"
        "    return later_def()\n"  # mutual/forward reference
        "def later_def():\n"
        "    comp = [y * CONST for y in range(3)]\n"  # comprehension
        "    pairs = {k: v for k, v in zip(comp, comp)}\n"
        "    fn = lambda a, *rest, **kw: (a, rest, kw)\n"
        "    if (w := len(pairs)) > 0:\n"  # walrus
        "        return fn(w)\n"
        "    return None\n"
        "class C:\n"
        "    attr: typing.Optional[int] = None\n"
        "    def m(self):\n"
        "        return self.attr\n"
        "def h():\n"
        "    global CONST\n"
        "    CONST = 2\n"
        "    with open('/dev/null') as fh:\n"
        "        for line in fh:\n"
        "            try:\n"
        "                pass\n"
        "            except OSError as err:\n"
        "                print(err, line)\n"
    )
    assert codes(src) == []


def test_class_scope_invisible_to_methods():
    src = (
        "class C:\n"
        "    helper = 1\n"
        "    def m(self):\n"
        "        return helper\n"  # NameError at runtime: not self.helper
    )
    assert ("undefined-name", 4) in codes(src)


def test_star_import_suppresses_undefined():
    src = "from os.path import *\nprint(join('a', 'b'))\n"
    assert all(c != "undefined-name" for c, _ in codes(src))


def test_repo_is_clean():
    repo = Path(__file__).parent.parent
    findings = astlint.lint_paths(
        [
            repo / "mimic3_tpu",
            repo / "scripts",
            repo / "tests",
            repo / "bench.py",
            repo / "__graft_entry__.py",
        ]
    )
    assert not findings, "\n".join(str(f) for f in findings)


def test_class_body_comprehension_sees_class_attrs():
    """CPython evaluates a comprehension's FIRST iterable in the
    enclosing scope, so a class-body comprehension may iterate a class
    attribute (legal Python; must not be flagged)."""
    src = (
        "class C:\n"
        "    xs = [1, 2]\n"
        "    ys = [x + 1 for x in xs]\n"
    )
    assert codes(src) == []


def test_comprehension_later_iterable_skips_class_scope():
    """...but LATER iterables evaluate inside the comprehension scope,
    which (like any nested scope) cannot see class attributes — real
    CPython raises NameError here, so the linter must flag it."""
    src = (
        "class C:\n"
        "    xs = [1]\n"
        "    zs = [y for x in xs for y in xs]\n"
    )
    assert ("undefined-name", 3) in codes(src)
