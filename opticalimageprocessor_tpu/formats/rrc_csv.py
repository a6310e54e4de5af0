"""Relative Radiometric Correction parameter file (CSV) reader/writer.

File layout (reference ``imageop.h:140-192``):

    line 1: ``1``            (format marker)
    line 2: ``<N>``          (number of parameter rows == detector columns)
    line 3: ``0``            (format marker)
    lines 4..3+N: ``k , b``  (per-detector-column linear gain/bias, doubles)

The reference parses with ``sscanf(" %lf , %lf")`` — i.e. arbitrary leading
whitespace, comma separator with optional surrounding spaces — and *throws*
when the header count mismatches the expected column count or when row count
differs from the header (imageop.h:160-162, 185-188).
"""

from __future__ import annotations

import numpy as np


class RRCParamError(ValueError):
    pass


def load_rrc_params(path: str, expected_columns: int) -> np.ndarray:
    """Load per-column (k, b) gain/bias pairs.

    Returns a float64 array of shape ``(expected_columns, 2)``: ``[:, 0]`` is
    the gain *k*, ``[:, 1]`` the bias *b*.

    Raises :class:`RRCParamError` on any of the invariants the reference
    enforces (header line-count mismatch, malformed row, row-count mismatch).
    """
    with open(path, "rb") as f:
        raw = f.read().decode("ascii", errors="replace")
    lines = raw.splitlines()
    if len(lines) < 3:
        raise RRCParamError(f"RRC param file [{path}] truncated header")
    # Header markers "1" / "0" are only assert()ed in the reference (DEBUG
    # builds, imageop.h:150-153,165-169); we warn-tolerate like release builds.
    try:
        declared = int(lines[1].strip() or "0")
    except ValueError:
        raise RRCParamError(
            f"RRC param file [{path}] line 2 is not a line count: {lines[1]!r}"
        )
    if declared != expected_columns:
        raise RRCParamError(
            f"RRC param file [{path}]: expected {expected_columns} lines, "
            f"{declared} found in file content"
        )

    rows = []
    for i, ln in enumerate(lines[3:]):
        if ln.strip() == "" and i >= declared:
            continue  # trailing blank lines
        parts = ln.split(",")
        if len(parts) != 2:
            raise RRCParamError(
                f"line #{i} of RRC param file [{path}] found invalid: {ln!r}"
            )
        try:
            k = float(parts[0])
            b = float(parts[1])
        except ValueError:
            raise RRCParamError(
                f"line #{i} of RRC param file [{path}] found invalid: {ln!r}"
            )
        rows.append((k, b))

    if len(rows) != expected_columns:
        raise RRCParamError(
            f"RRC Param file [{path}] invalid: {expected_columns} lines of "
            f"param expected, {len(rows)} lines parsed."
        )
    return np.asarray(rows, dtype=np.float64)


def save_rrc_params(path: str, params: np.ndarray) -> None:
    """Write params in the reference CSV layout (round-trips with the loader)."""
    params = np.asarray(params, dtype=np.float64)
    if params.ndim != 2 or params.shape[1] != 2:
        raise RRCParamError("params must have shape (columns, 2)")
    with open(path, "w") as f:
        f.write("1\n")
        f.write(f"{params.shape[0]}\n")
        f.write("0\n")
        for k, b in params:
            f.write(f"{float(k)!r} , {float(b)!r}\n")


def load_split_params(path: str, columns: int) -> "np.ndarray":
    """Load an RRC CSV and pre-split it for the device kernel
    (ops.rrc.split_rrc_params); an empty ``path`` yields identity
    parameters (k=1, b=0 — a bit-exact no-op through the RRC math).
    Shared by the scene/sharded pipelines' optional-RRC handling."""
    from ..ops.rrc import split_rrc_params

    if not path:
        return split_rrc_params(np.ones(columns), np.zeros(columns))
    kb = load_rrc_params(path, columns)
    return split_rrc_params(kb[:, 0], kb[:, 1])
