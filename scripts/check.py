#!/usr/bin/env python3
"""Static checks: byte-compile + import every module + AST lint.

The reference gates on black/isort/flake8/pylint/mypy
(reference: check.sh:34-46); none of those are available in this
environment, so this performs the checks that need no extra packages:
syntax (compileall), import-time errors for every module in the
package (catches missing imports, bad signatures at def time, etc.),
and scripts/astlint.py's flake8-subset pass (undefined names even in
un-executed branches, unused imports, duplicate args/dict keys).
"""

import compileall
import importlib
import pkgutil
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def main() -> int:
    sys.path.insert(0, str(REPO / "scripts"))
    import astlint

    lint_rc = astlint.main(
        [
            str(REPO / "mimic3_tpu"),
            str(REPO / "scripts"),
            str(REPO / "tests"),
            str(REPO / "bench.py"),
            str(REPO / "__graft_entry__.py"),
        ]
    )
    if lint_rc:
        print("astlint FAILED")
        return 1

    ok = compileall.compile_dir(
        str(REPO / "mimic3_tpu"), quiet=1, maxlevels=10
    )
    ok &= compileall.compile_dir(str(REPO / "tests"), quiet=1)
    ok &= compileall.compile_file(str(REPO / "bench.py"), quiet=1)
    ok &= compileall.compile_file(
        str(REPO / "__graft_entry__.py"), quiet=1
    )
    if not ok:
        print("compile FAILED")
        return 1

    sys.path.insert(0, str(REPO))
    import mimic3_tpu

    failures = []
    for mod_info in pkgutil.walk_packages(
        mimic3_tpu.__path__, prefix="mimic3_tpu."
    ):
        name = mod_info.name
        try:
            importlib.import_module(name)
        except Exception as err:
            failures.append((name, err))
            print(f"IMPORT FAILED {name}: {err}")
    if failures:
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
