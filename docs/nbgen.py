"""Executed-notebook (.ipynb) generator.

The reference ships *executed* Jupyter notebooks — prose, code, printed
output and rendered figures in one artifact
(``/root/reference/docs/source/notebooks/*.ipynb``, tested via nbval,
``/root/reference/pysgmcmc/Makefile:10-14``).  Jupyter is not available
in this environment, but a notebook file is plain nbformat-4 JSON: this
module executes a list of ``(markdown, code)`` cells top to bottom in a
shared namespace (same runner discipline as ``gen_getting_started.py``),
captures stdout and matplotlib figures per cell, and writes a genuine
executed ``.ipynb`` — loadable by Jupyter/VS Code/GitHub, re-executable
by nbval where available.

Used by ``docs/gen_notebook_*.py`` (wired into ``make docs``), so the
committed notebooks can never go stale relative to the API they
demonstrate.
"""

import base64
import contextlib
import io
import json
import textwrap

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _md_cell(text):
    return {
        "cell_type": "markdown",
        "metadata": {},
        "source": textwrap.dedent(text).strip().splitlines(keepends=True),
    }


def _code_cell(code, count, stdout, pngs):
    outputs = []
    if stdout:
        outputs.append({
            "output_type": "stream",
            "name": "stdout",
            "text": stdout.splitlines(keepends=True),
        })
    for png in pngs:
        outputs.append({
            "output_type": "display_data",
            "metadata": {},
            "data": {
                "image/png": base64.b64encode(png).decode(),
                "text/plain": ["<Figure>"],
            },
        })
    return {
        "cell_type": "code",
        "execution_count": count,
        "metadata": {},
        "source": code.splitlines(keepends=True),
        "outputs": outputs,
    }


def run_notebook(cells):
    """Execute ``(markdown, code)`` cells; return executed nbformat cells.

    Code cells share one namespace.  Raises on any cell error — a
    notebook that does not execute must fail ``make docs``, exactly like
    the reference's nbval gate.
    """
    ns = {}
    out_cells = []
    count = 0
    for prose, code in cells:
        if prose:
            out_cells.append(_md_cell(prose))
        if not code:
            continue
        count += 1
        code = textwrap.dedent(code).strip()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(compile(code, "<cell {}>".format(count), "exec"), ns)
        pngs = []
        for num in plt.get_fignums():
            img = io.BytesIO()
            plt.figure(num).savefig(
                img, format="png", dpi=110, bbox_inches="tight")
            pngs.append(img.getvalue())
        plt.close("all")
        out_cells.append(_code_cell(code, count, buf.getvalue(), pngs))
    return out_cells


def write_notebook(path, cells):
    """Write executed nbformat cells as a version-4 .ipynb file."""
    nb = {
        "nbformat": 4,
        "nbformat_minor": 5,
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            },
            "language_info": {"name": "python", "version": "3"},
        },
        "cells": cells,
    }
    with open(path, "w") as fh:
        json.dump(nb, fh, indent=1)
        fh.write("\n")
    n_code = sum(1 for c in cells if c["cell_type"] == "code")
    print("wrote {} ({} code cells executed)".format(path, n_code))
