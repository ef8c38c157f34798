"""Global-window lint (VERDICT r7 item 2): enumerate every
``Window.orderBy(...)`` site that has no ``partitionBy`` — i.e. every
window whose frame is a single global ordering and therefore plans as
a ONE-TASK sort of its input.

Such a window is fine when its input frame is bounded (a calendar of
days, a fixed bin grid, a ``limit(k)`` head, an enum) and a 100 TB
scale bug when the frame grows with the corpus. The classification
ledger lives in tests/test_window_lint.py; every site must be
classified there as either

- ``bounded``  — the frame provably cannot grow with corpus rows, or
- ``support``  — the frame is a distinct-VALUE axis (a CDF over money
  cents, score values, feature values): it grows with the corpus only
  until it saturates the value support, and the bucketed route
  (operators/stats.bucketed_prefix_sums or
  operators/windows.global_row_number) is the named fallback when a
  deployment's support is large.

No site may be classified as corpus-growing — those must be rewired
onto global_row_number / exact_ntile / bucketed_prefix_sums /
orderBy().limit(k), as the r8 pass did for the ntile, rank-then-
filter, and CDF families.

Run standalone to print the current site list:
    python tools/window_lint.py
"""

from __future__ import annotations

import os


def extract_sites(root: str | None = None) -> list[tuple[str, int, str]]:
    """All (relpath, lineno, stripped-code) occurrences of
    ``Window.orderBy(`` under the package root. The literal text is
    the detector: ``Window.partitionBy(...).orderBy(...)`` does not
    match, and every global-ordered window in this codebase is
    written through the ``Window.orderBy(`` spelling (a pytest in
    test_window_lint.py guards the spelling assumption)."""
    if root is None:
        import social_link_prediction_spark as pkg

        root = os.path.dirname(pkg.__file__)
    sites = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            with open(path) as f:
                lines = f.read().splitlines()
            for i, line in enumerate(lines):
                if "Window.orderBy(" in line:
                    sites.append((rel, i + 1, line.strip()))
    return sites


if __name__ == "__main__":
    for rel, ln, code in extract_sites():
        print(f"{rel}:{ln}: {code}")
