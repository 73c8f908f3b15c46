#!/usr/bin/env python3
"""Dependency-free AST linter: undefined names, unused imports,
duplicate function args / dict keys.

The reference repo gates on flake8/pylint/mypy (reference:
check.sh:34-46); none of those packages exist in this environment, so
this module implements the highest-value subset with only the stdlib
``ast`` module:

* **undefined-name** — a ``Name`` load that resolves to no binding in
  the lexical scope chain (with pyflakes-style hoisting: every binding
  anywhere in a scope counts, so mutual recursion and conditional
  definitions don't false-positive). Class scopes are skipped for
  nested functions, comprehensions get their own scope, ``global`` /
  ``nonlocal`` and walrus targets are honored.
* **unused-import** — an import whose bound name is never loaded
  anywhere in the module and isn't re-exported via ``__all__``.
  ``__init__.py`` files are exempt (re-export shims by convention),
  as is any import line containing ``noqa``.
* **duplicate-arg** — the same parameter name twice in a function or
  lambda signature (normally a SyntaxError, but checked for robustness
  on synthetic trees).
* **duplicate-key** — the same constant key twice in a dict literal.

Intentionally NOT flagged: use-before-def at module level (hoisting),
names behind ``from x import *`` (the module is marked "open" and
undefined-name checking is suppressed there), ``del``-then-use.
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

BUILTIN_NAMES = frozenset(dir(builtins)) | {
    "__file__",
    "__name__",
    "__doc__",
    "__package__",
    "__spec__",
    "__loader__",
    "__builtins__",
    "__debug__",
    "__path__",
    "__annotations__",
    "__dict__",
    "__class__",  # zero-arg super() inside methods
    "WindowsError",
}

_FUNC_NODES = (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)
_COMP_NODES = (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)


class Scope:
    __slots__ = ("node", "kind", "parent", "bindings", "globals", "children")

    def __init__(self, node, kind, parent):
        self.node = node
        self.kind = kind  # module | function | class | comprehension
        self.parent = parent
        self.bindings: set = set()
        self.globals: set = set()
        self.children: list = []
        if parent is not None:
            parent.children.append(self)


class Finding:
    __slots__ = ("path", "line", "code", "message")

    def __init__(self, path, line, code, message):
        self.path = path
        self.line = line
        self.code = code
        self.message = message

    def __str__(self):
        return f"{self.path}:{self.line}: {self.code} {self.message}"


def _arg_names(args: ast.arguments):
    for a in (
        list(getattr(args, "posonlyargs", []))
        + list(args.args)
        + list(args.kwonlyargs)
    ):
        yield a.arg
    if args.vararg:
        yield args.vararg.arg
    if args.kwarg:
        yield args.kwarg.arg


class _Binder(ast.NodeVisitor):
    """Pass 1: build the scope tree and collect every binding."""

    def __init__(self, module_scope: Scope):
        self.scope = module_scope
        self.module = module_scope
        self.star_import = False
        self.scope_of: dict = {id(module_scope.node): module_scope}

    # -- scope management -------------------------------------------------
    def _enter(self, node, kind):
        scope = Scope(node, kind, self.scope)
        self.scope_of[id(node)] = scope
        self.scope = scope
        return scope

    def _exit(self):
        self.scope = self.scope.parent

    def _bind(self, name):
        if name in self.scope.globals:
            self.module.bindings.add(name)
        else:
            self.scope.bindings.add(name)

    # -- binding constructs ------------------------------------------------
    def visit_FunctionDef(self, node):
        self._bind(node.name)
        for dec in node.decorator_list:
            self.visit(dec)
        if node.returns:
            self.visit(node.returns)
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            self.visit(default)
        for a in ast.walk(node.args):
            if isinstance(a, ast.arg) and a.annotation:
                self.visit(a.annotation)
        self._enter(node, "function")
        for name in _arg_names(node.args):
            self.scope.bindings.add(name)
        for stmt in node.body:
            self.visit(stmt)
        self._exit()

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_Lambda(self, node):
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            self.visit(default)
        self._enter(node, "function")
        for name in _arg_names(node.args):
            self.scope.bindings.add(name)
        self.visit(node.body)
        self._exit()

    def visit_ClassDef(self, node):
        self._bind(node.name)
        for dec in node.decorator_list:
            self.visit(dec)
        for base in list(node.bases) + list(node.keywords):
            self.visit(base)
        self._enter(node, "class")
        for stmt in node.body:
            self.visit(stmt)
        self._exit()

    def _visit_comp(self, node):
        # CPython evaluates the FIRST generator's iterable in the
        # ENCLOSING scope (e.g. a class-body comprehension may iterate
        # a class attribute); later iterables run inside the
        # comprehension scope
        self.visit(node.generators[0].iter)
        self._enter(node, "comprehension")
        for i, gen in enumerate(node.generators):
            self.visit(gen.target)
            if i > 0:
                self.visit(gen.iter)
            for cond in gen.ifs:
                self.visit(cond)
        if isinstance(node, ast.DictComp):
            self.visit(node.key)
            self.visit(node.value)
        else:
            self.visit(node.elt)
        self._exit()

    visit_ListComp = _visit_comp
    visit_SetComp = _visit_comp
    visit_DictComp = _visit_comp
    visit_GeneratorExp = _visit_comp

    def visit_Name(self, node):
        if isinstance(node.ctx, (ast.Store, ast.Del)):
            self._bind(node.id)

    def visit_Import(self, node):
        for alias in node.names:
            self._bind(alias.asname or alias.name.split(".")[0])

    def visit_ImportFrom(self, node):
        for alias in node.names:
            if alias.name == "*":
                self.star_import = True
            else:
                self._bind(alias.asname or alias.name)

    def visit_Global(self, node):
        self.scope.globals.update(node.names)
        self.module.bindings.update(node.names)

    def visit_Nonlocal(self, node):
        # bound in an enclosing function scope; treat as local so the
        # use resolves (actual existence is checked by CPython itself)
        self.scope.bindings.update(node.names)

    def visit_ExceptHandler(self, node):
        if node.name:
            self._bind(node.name)
        self.generic_visit(node)

    def visit_NamedExpr(self, node):
        # walrus binds in the nearest enclosing non-comprehension scope
        target = self.scope
        while target.kind == "comprehension":
            target = target.parent
        target.bindings.add(node.target.id)
        self.visit(node.value)

    def visit_MatchAs(self, node):
        if node.name:
            self._bind(node.name)
        self.generic_visit(node)

    def visit_MatchStar(self, node):
        if node.name:
            self._bind(node.name)

    def visit_MatchMapping(self, node):
        if node.rest:
            self._bind(node.rest)
        self.generic_visit(node)


class _Checker(ast.NodeVisitor):
    """Pass 2: resolve every Name load against the scope chain."""

    def __init__(self, path, binder: _Binder, findings):
        self.path = path
        self.binder = binder
        self.scope = binder.module
        self.findings = findings

    def _resolvable(self, name, scope: Scope) -> bool:
        s, first = scope, True
        while s is not None:
            # class scope is invisible to anything but its own body
            if first or s.kind != "class":
                if name in s.bindings:
                    return True
            first = False
            s = s.parent
        return name in BUILTIN_NAMES

    def _in_scope(self, node, body_visit):
        prev = self.scope
        self.scope = self.binder.scope_of[id(node)]
        body_visit()
        self.scope = prev

    def visit_FunctionDef(self, node):
        for dec in node.decorator_list:
            self.visit(dec)
        if getattr(node, "returns", None):
            self.visit(node.returns)
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            self.visit(default)
        for a in ast.walk(node.args):
            if isinstance(a, ast.arg) and a.annotation:
                self.visit(a.annotation)
        self._check_duplicate_args(node)
        self._in_scope(
            node, lambda: [self.visit(s) for s in node.body]
        )

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_Lambda(self, node):
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            self.visit(default)
        self._check_duplicate_args(node)
        self._in_scope(node, lambda: self.visit(node.body))

    def visit_ClassDef(self, node):
        for dec in node.decorator_list:
            self.visit(dec)
        for base in list(node.bases) + list(node.keywords):
            self.visit(base)
        self._in_scope(
            node, lambda: [self.visit(s) for s in node.body]
        )

    def _visit_comp(self, node):
        # first iterable: evaluated in the ENCLOSING scope by CPython
        # (a class-body comprehension may iterate a class attribute)
        self.visit(node.generators[0].iter)

        def body():
            for i, gen in enumerate(node.generators):
                self.visit(gen.target)
                if i > 0:
                    self.visit(gen.iter)
                for cond in gen.ifs:
                    self.visit(cond)
            if isinstance(node, ast.DictComp):
                self.visit(node.key)
                self.visit(node.value)
            else:
                self.visit(node.elt)

        self._in_scope(node, body)

    visit_ListComp = _visit_comp
    visit_SetComp = _visit_comp
    visit_DictComp = _visit_comp
    visit_GeneratorExp = _visit_comp

    def visit_Name(self, node):
        if (
            isinstance(node.ctx, ast.Load)
            and not self.binder.star_import
            and not self._resolvable(node.id, self.scope)
        ):
            self.findings.append(
                Finding(
                    self.path,
                    node.lineno,
                    "undefined-name",
                    f"undefined name '{node.id}'",
                )
            )

    def visit_Dict(self, node):
        seen = set()
        for key in node.keys:
            if isinstance(key, ast.Constant):
                try:
                    marker = (type(key.value).__name__, key.value)
                except TypeError:
                    continue
                if marker in seen:
                    self.findings.append(
                        Finding(
                            self.path,
                            key.lineno,
                            "duplicate-key",
                            f"duplicate dict key {key.value!r}",
                        )
                    )
                seen.add(marker)
        self.generic_visit(node)

    def _check_duplicate_args(self, node):
        seen = set()
        for name in _arg_names(node.args):
            if name in seen:
                self.findings.append(
                    Finding(
                        self.path,
                        node.lineno,
                        "duplicate-arg",
                        f"duplicate argument '{name}'",
                    )
                )
            seen.add(name)


def _check_unused_imports(path, tree, source_lines, findings):
    if Path(path).name == "__init__.py":
        return
    imported = {}  # name -> (lineno, shown)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = alias.asname or alias.name.split(".")[0]
                imported.setdefault(name, (node.lineno, alias.name))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                name = alias.asname or alias.name
                imported.setdefault(name, (node.lineno, alias.name))
    if not imported:
        return
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            used.add(node.id)
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)  # __all__ entries / string annotations
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            used.update(node.names)
    for name, (lineno, shown) in sorted(imported.items()):
        if name in used:
            continue
        line = (
            source_lines[lineno - 1]
            if lineno - 1 < len(source_lines)
            else ""
        )
        if "noqa" in line:
            continue
        findings.append(
            Finding(
                path,
                lineno,
                "unused-import",
                f"'{shown}' imported but unused",
            )
        )


def lint_source(source: str, path: str = "<string>"):
    """Lint one module's source. Returns a list of Finding."""
    findings: list = []
    try:
        tree = ast.parse(source, filename=path)
    except SyntaxError as err:
        findings.append(
            Finding(path, err.lineno or 0, "syntax-error", str(err.msg))
        )
        return findings
    module_scope = Scope(tree, "module", None)
    module_scope.bindings.add("__all__")
    binder = _Binder(module_scope)
    binder.visit(tree)
    _Checker(path, binder, findings).visit(tree)
    _check_unused_imports(path, tree, source.splitlines(), findings)
    return findings


def lint_paths(paths):
    findings = []
    for path in paths:
        p = Path(path)
        files = sorted(p.rglob("*.py")) if p.is_dir() else [p]
        for f in files:
            findings.extend(
                lint_source(f.read_text(encoding="utf-8"), str(f))
            )
    return findings


def main(argv) -> int:
    targets = argv or ["mimic3_tpu", "scripts", "bench.py",
                       "__graft_entry__.py", "tests"]
    findings = lint_paths(targets)
    for f in findings:
        print(f)
    print(f"astlint: {len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
