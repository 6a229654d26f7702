"""Column-role taxonomy for the featurization pipeline.

The reference classifies every feature column on two independent axes —
categorical vs continuous, sequential vs non-sequential (profile) — plus
date columns and label columns (reference: caspr/utils/spark/preprocess.py:542-566
``pipeline`` signature, caspr/utils/preprocess.py:245-277 ``generate_col_lists``).

``ColumnRoles`` is the validated, serializable equivalent of the reference's
six loose list arguments.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


def _numbered(i: int, seq_len: int, left_pad: bool) -> int:
    """Slot number for position ``i`` (0-based): 1..seq_len, reversed when left-padded.

    Mirrors ``number_cols`` in the reference (caspr/utils/preprocess.py:258-259):
    left-pad reverses numbering so slot 1 is always the *oldest* retained event.
    """
    return seq_len - i if left_pad else i + 1


def expand_seq_cols(cols: list[str], seq_cols: list[str], seq_len: int,
                    left_pad: bool = False) -> list[str]:
    """Expand each sequential column ``c`` into ``{slot}_{c}`` wide names.

    Non-sequential columns pass through unchanged. Same `{i}_{c}` naming as
    the reference's spark layout (caspr/utils/preprocess.py:245-277).
    """
    out: list[str] = []
    for c in cols:
        if c in seq_cols:
            out.extend(f"{_numbered(i, seq_len, left_pad)}_{c}" for i in range(seq_len))
        else:
            out.append(c)
    return out


def generate_col_lists(seq_len: int, cat_cols: list[str], cont_cols: list[str],
                       date_cols: list[str], seq_cols: list[str],
                       non_seq_cols: list[str], left_pad: bool = False):
    """Expanded (cat, cont, seq, non_seq, date) wide-layout name lists.

    Signature-compatible with the reference ``generate_col_lists``
    (caspr/utils/preprocess.py:245-277).
    """
    return (
        expand_seq_cols(cat_cols, seq_cols, seq_len, left_pad),
        expand_seq_cols(cont_cols, seq_cols, seq_len, left_pad),
        expand_seq_cols(seq_cols, seq_cols, seq_len, left_pad),
        list(non_seq_cols),
        expand_seq_cols(date_cols, seq_cols, seq_len, left_pad),
    )


@dataclass
class ColumnRoles:
    """Declares how each column of an activity table participates in featurization.

    Attributes mirror the reference ``pipeline`` arguments
    (caspr/utils/spark/preprocess.py:542-566):

    - ``tgt_id``: entity key column(s) — may be composite.
    - ``activity_date``: event-timestamp column (must appear in ``date_cols``).
    - ``prediction_date``: per-entity cutoff-timestamp column.
    - ``cat_cols`` / ``cont_cols``: categorical vs continuous feature columns.
    - ``seq_cols`` / ``non_seq_cols``: sequential (pivoted) vs profile columns.
    - ``date_cols``: timestamp feature columns (featurized to epoch/interval).
    - ``output_cols``: label column(s), joined onto the profile branch.
    - ``order_tiebreak``: extra ordering column(s) appended after the activity
      date when ranking events, so duplicate timestamps rank deterministically
      (the reference orders by date only — nondeterministic under ties).
    """

    tgt_id: list[str]
    activity_date: str
    prediction_date: str = "prediction_date"
    cat_cols: list[str] = field(default_factory=list)
    cont_cols: list[str] = field(default_factory=list)
    seq_cols: list[str] = field(default_factory=list)
    non_seq_cols: list[str] = field(default_factory=list)
    date_cols: list[str] = field(default_factory=list)
    output_cols: list[str] = field(default_factory=list)
    order_tiebreak: list[str] = field(default_factory=list)

    def __post_init__(self):
        if isinstance(self.tgt_id, str):
            self.tgt_id = [self.tgt_id]
        if self.activity_date not in self.date_cols:
            self.date_cols = [*self.date_cols, self.activity_date]
        overlap = set(self.cat_cols) & set(self.cont_cols)
        if overlap:
            raise ValueError(f"columns both categorical and continuous: {sorted(overlap)}")

    def validate(self, df) -> None:
        """Check every declared column exists in ``df`` (minimal, like the reference)."""
        missing = [c for c in self.all_cols() if c not in df.columns]
        if missing:
            raise ValueError(f"columns not in DataFrame: {missing}")

    def all_cols(self) -> list[str]:
        seen, out = set(), []
        for c in (*self.tgt_id, self.activity_date, *self.cat_cols, *self.cont_cols,
                  *self.seq_cols, *self.non_seq_cols, *self.date_cols, *self.output_cols):
            if c not in seen:
                seen.add(c)
                out.append(c)
        return out

    def wide_lists(self, seq_len: int, left_pad: bool = False):
        """Expanded (cat, cont, seq, non_seq, date) name lists for the pivoted layout."""
        return generate_col_lists(seq_len, self.cat_cols, self.cont_cols,
                                  self.date_cols, self.seq_cols,
                                  self.non_seq_cols, left_pad)

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnRoles":
        return cls(**d)
