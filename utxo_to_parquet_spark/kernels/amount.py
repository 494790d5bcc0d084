"""Bitcoin Core amount (de)compression.

``decompress_amount`` matches /root/reference/src/main.rs:83-107;
``compress_amount`` is the inverse (reimplemented from the published
Bitcoin Core ``CompressAmount`` algorithm) so tests can round-trip and
fixture generators can produce valid streams.

The compressed form exploits that most amounts have many trailing
decimal zeros: value ``n = m * 10^e`` with m not divisible by 10 is
stored as ``1 + 10*(9*floor(m/10) + (m%10) - 1) + e`` for e < 9, or
``1 + 10*(n' - 1) + 9`` where ``n' = n / 10^9`` when e >= 9.
"""

from __future__ import annotations


def decompress_amount(x: int) -> int:
    """Invert Bitcoin Core's CompressAmount. Pure scalar, branch-true port
    of the published algorithm (see module docstring)."""
    if x == 0:
        return 0
    x -= 1
    e = x % 10
    x //= 10
    if e < 9:
        d = (x % 9) + 1
        x //= 9
        n = x * 10 + d
    else:
        n = x + 1
    return n * (10**e)


def compress_amount(n: int) -> int:
    """Bitcoin Core CompressAmount: inverse of :func:`decompress_amount`."""
    if n == 0:
        return 0
    e = 0
    while n % 10 == 0 and e < 9:
        n //= 10
        e += 1
    if e < 9:
        d = n % 10
        assert 1 <= d <= 9
        n //= 10
        return 1 + (n * 9 + d - 1) * 10 + e
    return 1 + (n - 1) * 10 + 9
