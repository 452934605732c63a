"""Statement coverage for the test suite, no external dependencies.

The reference's CI measures statement coverage on every run via
pytest-cov (``/root/reference/pysgmcmc/pytest.ini:2`` — ``--cov=pysgmcmc``).
This environment ships no coverage tooling, so this module implements the
same measurement on Python 3.12's ``sys.monitoring`` (PEP 669):

- LINE events fire per code location; the callback records the first hit
  for files under ``pysgmcmc_tpu/`` and returns
  ``sys.monitoring.DISABLE``, which switches that location off — every
  location (in or out of the package) pays for at most ONE callback, so
  the suite runs at effectively full speed.
- The executable-line ground truth comes from compiling each source file
  and walking ``co_lines()`` over the code-object tree (the same line
  table the monitoring events are generated from), so hit/executable
  sets agree by construction.

Note the measurement is *trace* coverage, as for any JAX program: a
jitted function's Python body runs once at trace time, so numerical
branches inside ``lax.cond``/``jnp.where`` count as covered when traced.

Usage:
    PYSGMCMC_COVERAGE=1 python -m pytest tests/ -q     # via tests/conftest.py
    bash ci/run_tests.sh cov                            # fast lane + report
    python ci/coverage.py report .coverage.json         # re-print a report
"""

import json
import os
import sys
import types

_TOOL = None
_HITS = {}  # filename -> set of line numbers
_PKG_PREFIX = None


def _callback(code, line_number):
    if code.co_filename.startswith(_PKG_PREFIX):
        _HITS.setdefault(code.co_filename, set()).add(line_number)
    return sys.monitoring.DISABLE


def start(package_dir):
    """Begin collecting line hits for files under ``package_dir``."""
    global _TOOL, _PKG_PREFIX
    if _TOOL is not None:
        return
    _PKG_PREFIX = os.path.abspath(package_dir) + os.sep
    _TOOL = sys.monitoring.COVERAGE_ID
    sys.monitoring.use_tool_id(_TOOL, "pysgmcmc-cov")
    sys.monitoring.register_callback(
        _TOOL, sys.monitoring.events.LINE, _callback
    )
    sys.monitoring.set_events(_TOOL, sys.monitoring.events.LINE)


def executable_lines(path):
    """All line numbers that can emit LINE events in ``path``."""
    with open(path) as f:
        source = f.read()
    lines = set()
    stack = [compile(source, path, "exec")]
    while stack:
        code = stack.pop()
        for _, _, lineno in code.co_lines():
            # lineno 0 is the synthetic module-level RESUME in 3.12,
            # not a source statement
            if lineno:
                lines.add(lineno)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return lines


def _ranges(line_numbers):
    """Compact ``[1, 2, 3, 7]`` into ``"1-3, 7"``."""
    out, start, prev = [], None, None
    for n in sorted(line_numbers):
        if start is None:
            start = prev = n
        elif n == prev + 1:
            prev = n
        else:
            out.append(str(start) if start == prev else
                       "{}-{}".format(start, prev))
            start = prev = n
    if start is not None:
        out.append(str(start) if start == prev else
                   "{}-{}".format(start, prev))
    return ", ".join(out)


def collect(package_dir):
    """Stop collection and return ``{relpath: (covered, executable,
    missing)}`` for every ``.py`` file under ``package_dir``."""
    pkg = os.path.abspath(package_dir)
    if _TOOL is not None:
        sys.monitoring.set_events(_TOOL, 0)
    results = {}
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            executable = executable_lines(path)
            hit = _HITS.get(path, set()) & executable
            results[os.path.relpath(path, os.path.dirname(pkg))] = {
                "covered": len(hit),
                "executable": len(executable),
                "missing": sorted(executable - hit),
            }
    return results


def report(results, stream=sys.stdout, max_missing_shown=3):
    """Print the per-module table (worst first) and the total."""
    total_cov = sum(r["covered"] for r in results.values())
    total_exe = sum(r["executable"] for r in results.values())
    rows = sorted(
        results.items(), key=lambda kv: len(kv[1]["missing"]), reverse=True
    )
    width = max(len(name) for name in results) if results else 20
    print("{:<{w}} {:>6} {:>6} {:>7}".format(
        "module", "stmts", "miss", "cover", w=width), file=stream)
    for name, r in rows:
        pct = 100.0 * r["covered"] / r["executable"] if r["executable"] else 100.0
        print("{:<{w}} {:>6} {:>6} {:>6.1f}%".format(
            name, r["executable"], len(r["missing"]), pct, w=width),
            file=stream)
    pct = 100.0 * total_cov / total_exe if total_exe else 100.0
    print("{:<{w}} {:>6} {:>6} {:>6.1f}%".format(
        "TOTAL", total_exe, total_exe - total_cov, pct, w=width),
        file=stream)
    print("\nLargest uncovered regions:", file=stream)
    for name, r in rows[:max_missing_shown]:
        if r["missing"]:
            print("  {}: {}".format(name, _ranges(r["missing"])),
                  file=stream)


def write_json(results, path):
    with open(path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)


def main(argv):
    if len(argv) >= 2 and argv[0] == "report":
        with open(argv[1]) as f:
            results = json.load(f)
        report(results)
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
