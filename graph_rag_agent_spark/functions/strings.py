"""String distance kernels for the pure-Python oracle.

Spark-side uses the built-in ``F.levenshtein`` (JVM, codegen); the oracle
needs an identical-semantics Python implementation (standard unit-cost
edit distance, same as Apache Commons StringUtils behind Spark's builtin).
"""

from __future__ import annotations


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
