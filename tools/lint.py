"""Stdlib static-analysis gate (the ``clippy -D warnings`` analog).

The reference's only lint gate is ``clippy_check.sh`` running ``cargo
clippy --all -- -D warnings`` (``/root/reference/clippy_check.sh:1-4``).
This image ships no Python linters (no ruff/mypy/pyflakes and installs
are disallowed), so this is a from-scratch checker over ``ast`` +
``symtable`` covering the highest-signal defect classes:

- **undefined names**: referenced free names that resolve in no
  enclosing scope, module global, wildcard import, or builtin
- **unused imports** (module scope; ``__init__.py`` re-exports, names
  in ``__all__``, and ``# noqa`` lines exempt)
- **duplicate definitions**: same function/method name bound twice in
  one class/module body (the later silently wins)
- **duplicate dict-literal keys** (the later silently wins)
- **assert on a non-empty tuple** (always true)
- **`is` / `is not` against str/int/float literals** (identity of
  interned values is an implementation detail)
- **mutable default arguments** (list/dict/set literals)
- **syntax errors** (parse failure is a finding, not a crash)

Any finding fails the run (exit 1) — warnings are errors, like the
reference gate.  Suppress per-line with ``# noqa`` or
``# noqa: <rule>``.  Usage::

    python tools/lint.py [paths...]     # default: repo sources
"""

from __future__ import annotations

import ast
import builtins
import sys
import symtable
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

DEFAULT_TARGETS = [
    "helix_tpu", "tests", "benchmarks", "tools", "bench.py",
    "__graft_entry__.py",
]

BUILTINS = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__path__", "__all__",
    "__annotations__", "__dict__", "__class__", "WindowsError",
}

RULES = (
    "undefined-name", "unused-import", "duplicate-def", "duplicate-key",
    "assert-tuple", "is-literal", "mutable-default", "syntax-error",
)


class Finding:
    def __init__(self, path: Path, line: int, rule: str, msg: str):
        self.path, self.line, self.rule, self.msg = path, line, rule, msg

    def __str__(self) -> str:
        return f"{self.path}:{self.line}: [{self.rule}] {self.msg}"


# pyflakes/ruff code aliases so existing annotations keep working
_RULE_ALIASES = {
    "F401": "unused-import",
    "F811": "duplicate-def",
    "F821": "undefined-name",
    "F631": "assert-tuple",
    "F632": "is-literal",
    "B006": "mutable-default",
}


def _noqa_lines(source: str) -> dict[int, set[str] | None]:
    """line -> None (blanket noqa) or set of rule names."""
    out: dict[int, set[str] | None] = {}
    for i, line in enumerate(source.splitlines(), 1):
        if "# noqa" not in line:
            continue
        _, _, tail = line.partition("# noqa")
        tail = tail.strip()
        if tail.startswith(":"):
            rules = set()
            for t in tail[1:].split(","):
                t = t.strip().split()[0] if t.strip() else ""
                rules.add(_RULE_ALIASES.get(t, t))
            out[i] = rules
        else:
            out[i] = None
    return out


def _has_wildcard_import(tree: ast.Module) -> bool:
    return any(
        isinstance(n, ast.ImportFrom) and any(a.name == "*" for a in n.names)
        for n in ast.walk(tree)
    )


def _module_all(tree: ast.Module) -> set[str]:
    names: set[str] = set()
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "__all__"
                for t in node.targets
            )
            and isinstance(node.value, (ast.List, ast.Tuple))
        ):
            for el in node.value.elts:
                if isinstance(el, ast.Constant) and isinstance(el.value, str):
                    names.add(el.value)
    return names


# --------------------------------------------------------------- undefined


def _scope_lookup(table: symtable.SymbolTable, name: str) -> bool:
    """Does ``name`` resolve in ``table`` or any enclosing scope chain?

    Mirrors Python's rules closely enough for linting: class scopes are
    skipped when resolving from nested functions."""
    t: symtable.SymbolTable | None = table
    first = True
    while t is not None:
        if first or t.get_type() != "class":
            try:
                sym = t.lookup(name)
            except KeyError:
                sym = None
            if sym is not None and (
                sym.is_assigned() or sym.is_imported() or sym.is_parameter()
                or sym.is_namespace()
            ):
                return True
        first = False
        t = getattr(t, "_parent", None)
    return False


def _attach_parents(table: symtable.SymbolTable) -> None:
    for child in table.get_children():
        child._parent = table  # type: ignore[attr-defined]
        _attach_parents(child)


def _name_use_lines(tree: ast.Module) -> dict[str, list[int]]:
    uses: dict[str, list[int]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            uses.setdefault(node.id, []).append(node.lineno)
    return uses


def _check_undefined(path: Path, source: str, tree: ast.Module,
                     findings: list[Finding]) -> None:
    if _has_wildcard_import(tree):
        return  # wildcard imports defeat static resolution
    try:
        top = symtable.symtable(source, str(path), "exec")
    except (SyntaxError, ValueError):
        return
    top._parent = None  # type: ignore[attr-defined]
    _attach_parents(top)
    module_names = {
        s.get_name() for s in top.get_symbols()
        if s.is_assigned() or s.is_imported() or s.is_namespace()
    }
    use_lines = _name_use_lines(tree)
    reported: set[str] = set()

    def visit(table: symtable.SymbolTable) -> None:
        for sym in table.get_symbols():
            name = sym.get_name()
            if not sym.is_referenced() or name in reported:
                continue
            if sym.is_assigned() or sym.is_imported() or sym.is_parameter() \
                    or sym.is_namespace():
                continue
            if sym.is_global() or sym.is_declared_global():
                if name in module_names or name in BUILTINS:
                    continue
            elif sym.is_free() or _scope_lookup(table, name):
                # free variables resolved by the compiler are defined
                continue
            elif name in BUILTINS or name in module_names:
                continue
            if name in BUILTINS or name in module_names:
                continue
            line = use_lines.get(name, [0])[0]
            reported.add(name)
            findings.append(Finding(
                path, line, "undefined-name",
                f"name '{name}' is not defined in any enclosing scope",
            ))
        for child in table.get_children():
            visit(child)

    visit(top)


# ------------------------------------------------------------ AST checks


class _AstChecker(ast.NodeVisitor):
    def __init__(self, path: Path, findings: list[Finding]):
        self.path = path
        self.findings = findings

    def _add(self, node: ast.AST, rule: str, msg: str) -> None:
        self.findings.append(
            Finding(self.path, getattr(node, "lineno", 0), rule, msg)
        )

    # duplicate function/method definitions in one body
    def _check_body_dupes(self, body: list[ast.stmt]) -> None:
        seen: dict[str, int] = {}
        for stmt in body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
                # @overload / @property-setter stacks legitimately rebind
                decs = {
                    d.id if isinstance(d, ast.Name)
                    else getattr(d, "attr", "")
                    for d in stmt.decorator_list
                }
                if decs & {"overload", "setter", "getter", "deleter",
                           "register"}:
                    continue
                if stmt.name in seen:
                    self._add(
                        stmt, "duplicate-def",
                        f"'{stmt.name}' already defined at line "
                        f"{seen[stmt.name]} (this definition silently wins)",
                    )
                seen[stmt.name] = stmt.lineno

    def visit_Module(self, node: ast.Module) -> None:
        self._check_body_dupes(node.body)
        self.generic_visit(node)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self._check_body_dupes(node.body)
        self.generic_visit(node)

    def visit_Dict(self, node: ast.Dict) -> None:
        seen: dict[object, int] = {}
        for key in node.keys:
            if isinstance(key, ast.Constant):
                try:
                    marker = (type(key.value).__name__, key.value)
                except TypeError:
                    continue
                if marker in seen:
                    self._add(
                        key, "duplicate-key",
                        f"duplicate dict key {key.value!r} (first at line "
                        f"{seen[marker]})",
                    )
                seen[marker] = key.lineno
        self.generic_visit(node)

    def visit_Assert(self, node: ast.Assert) -> None:
        if isinstance(node.test, ast.Tuple) and node.test.elts:
            self._add(node, "assert-tuple",
                      "assert on a non-empty tuple is always true")
        self.generic_visit(node)

    def visit_Compare(self, node: ast.Compare) -> None:
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Is, ast.IsNot)) and (
                isinstance(comp, ast.Constant)
                and isinstance(comp.value, (str, int, float))
                and not isinstance(comp.value, bool)
            ):
                self._add(node, "is-literal",
                          "'is' comparison against a literal: identity of "
                          "interned values is an implementation detail")
        self.generic_visit(node)

    def _check_defaults(self, node) -> None:
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                self._add(default, "mutable-default",
                          "mutable default argument is shared across calls")

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)


def _check_unused_imports(path: Path, tree: ast.Module,
                          findings: list[Finding]) -> None:
    if path.name == "__init__.py":
        return  # re-export surface
    exported = _module_all(tree)
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # dotted use like ``jax.numpy``: the root Name node covers it
            pass
    # names referenced inside string annotations / __all__ count as used
    used |= exported
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                bound = alias.asname or alias.name.split(".")[0]
                if bound not in used:
                    findings.append(Finding(
                        path, node.lineno, "unused-import",
                        f"'{alias.name}' imported but unused",
                    ))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue  # compiler directives, not bindings
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = alias.asname or alias.name
                if bound not in used:
                    findings.append(Finding(
                        path, node.lineno, "unused-import",
                        f"'{alias.name}' imported but unused",
                    ))


# --------------------------------------------------------------- driver


def lint_file(path: Path) -> list[Finding]:
    try:
        source = path.read_text(encoding="utf-8")
    except (OSError, UnicodeDecodeError) as exc:
        return [Finding(path, 0, "syntax-error", f"unreadable: {exc}")]
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as exc:
        return [Finding(path, exc.lineno or 0, "syntax-error", str(exc.msg))]
    findings: list[Finding] = []
    _check_undefined(path, source, tree, findings)
    _check_unused_imports(path, tree, findings)
    _AstChecker(path, findings).visit(tree)
    noqa = _noqa_lines(source)
    kept = []
    for f in findings:
        rules = noqa.get(f.line, False)
        if rules is None or (rules and f.rule in rules):
            continue
        kept.append(f)
    return kept


def main(argv: list[str] | None = None) -> int:
    targets = (argv or sys.argv[1:]) or DEFAULT_TARGETS
    files: list[Path] = []
    for t in targets:
        p = (REPO / t) if not Path(t).is_absolute() else Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    findings: list[Finding] = []
    for f in files:
        findings.extend(lint_file(f))
    for finding in sorted(findings, key=lambda f: (str(f.path), f.line)):
        print(finding)
    print(f"lint: {len(files)} files, {len(findings)} findings",
          file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
