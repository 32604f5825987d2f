"""Double Metaphone phonetic encoding — the industry-default English
blocking key (Philips, C/C++ Users Journal, June 2000), completing the
linkage family's phonetic legs next to Soundex and Cologne
(operators/linkage.py).

Unlike Cologne, the rule set is NOT (prev, curr, next)-local: rules
look up to 6 characters ahead ("ORCHES"), 4 behind ("ME"/"MA" before a
final -IER), at absolute word positions ("SCH" prefix), and advance a
cursor by 1-4 positions per step — so per the repo's decision record
(CLAUDE.md: NYSIIS-style in-place rewriting is the shape to avoid,
aggregate-fold is the shape to use), the encode is ONE JVM ``aggregate``
HOF whose state is ``(cursor, primary, secondary)`` and whose step
applies the full rule table, mirrored by a recursive-CTE replay in the
DuckDB oracle (the ``soundex_blocks`` shape, catalog.py).

Engine portability: the entire rule table is generated ONCE by
:func:`_dm_rule_case` from position/word expressions, using only
functions with identical semantics in Spark SQL and DuckDB
(``substring`` 1-based, ``instr``, ``length``, ``replace``, ``CASE``,
``IN``) — the Spark fold and the oracle CTE consume the SAME string, so
there is no second hand-maintained rule table to drift. Every rule
outcome is a CONSTANT ``(advance, primary-add, secondary-add)`` triple,
encoded as a fixed-width 5-char literal ``<adv><pp><ss>`` ('.'-padded),
so the step expression is a single CASE tree evaluated exactly once per
cursor step (let-bound via the transform-of-one-element idiom — the
CLAUDE.md expensive-expression-in-HOF rule).

Faithfulness notes (pinned by published canonical vectors in
tests/test_metaphone.py):

* The word is padded with 5 trailing spaces exactly like the original
  (``GetAt`` past the end must read ``' '`` — the bare-"JOSE" rule and
  the C-default ``" C"/" Q"/" G"`` lookahead depend on it).
* The original's always-true ``GetAt(current+1) != 'Y'`` guard inside
  the GN branch is reproduced by omission (it is inside the
  ``GetAt(current+1)=='N'`` arm, so it can never fire — a published
  quirk every faithful port keeps).
* ``MetaphAdd(x, " ")`` (primary-only adds: final Spanish -LL-, final
  -J) appends nothing to the secondary, matching the original's
  leading-space sentinel.
* Codes are truncated to 4 characters (the original's termination
  condition); the secondary is always emitted as computed (equal to the
  primary when no alternate rule fired).
* Input domain is ASCII alphabetic; the Latin-1 Ç/Ñ arms of the
  original are unreachable and omitted.

Scale shape: per-row JVM string fold, no shuffle, embarrassingly
parallel; cost is O(word length) big-CASE evaluations per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "with_double_metaphone",
    "dm_init_sql",
    "dm_rule_case_sql",
]

_VOWELS = "('A', 'E', 'I', 'O', 'U', 'Y')"


def _q(strs) -> str:
    return ", ".join(f"'{s}'" for s in strs)


def _leaf(adv: int, pa: str, sa: str | None = None) -> str:
    """Constant rule outcome: advance + primary add + secondary add,
    fixed-width '<adv><pp><ss>' with '.' padding (adds are <= 2 chars)."""
    if sa is None:
        sa = pa
    return f"'{adv}{(pa + '..')[:2]}{(sa + '..')[:2]}'"


class _Gen:
    """SQL-fragment helpers over (padded word ``w``, unpadded length
    ``n``, 1-based cursor ``p``). 0-based algorithm offsets translate as
    current+k -> position p+k; negative offsets are range-guarded
    because BOTH engines treat substring start <= 0 as from-the-end."""

    def __init__(self, w: str, n: str, p: str):
        self.w, self.n, self.p = w, n, p

    def ch(self, off: int = 0) -> str:
        pos = f"{self.p} + {off}" if off else self.p
        e = f"substring({self.w}, {pos}, 1)"
        if off < 0:
            return f"(CASE WHEN {self.p} >= {1 - off} THEN {e} ELSE '' END)"
        return e

    def chabs(self, k0: int) -> str:
        return f"substring({self.w}, {k0 + 1}, 1)"

    def at(self, off: int, ln: int, *strs: str) -> str:
        pos = f"{self.p} + {off}" if off else self.p
        cond = f"substring({self.w}, {pos}, {ln}) IN ({_q(strs)})"
        if off < 0:
            return f"({self.p} >= {1 - off} AND {cond})"
        return f"({cond})"

    def at0(self, start0: int, ln: int, *strs: str) -> str:
        return f"(substring({self.w}, {start0 + 1}, {ln}) IN ({_q(strs)}))"

    def at_last(self, off0: int, ln: int, *strs: str) -> str:
        # StringAt(last + off0, ln, ...) with last = n-1 zero-based.
        start = f"{self.n} + {off0}" if off0 else self.n
        return (
            f"({self.n} >= {1 - off0} AND"
            f" substring({self.w}, {start}, {ln}) IN ({_q(strs)}))"
        )

    def vowel(self, off: int) -> str:
        return f"({self.ch(off)} IN {_VOWELS})"

    def vowel_abs(self, k0: int) -> str:
        return f"({self.chabs(k0)} IN {_VOWELS})"

    def sg(self) -> str:
        # "Slavo-Germanic" marker: W / K / CZ anywhere (WITZ implies W).
        return (
            f"(instr({self.w}, 'W') > 0 OR instr({self.w}, 'K') > 0"
            f" OR instr({self.w}, 'CZ') > 0)"
        )


def _adv2if(cond: str, pa: str, sa: str | None = None) -> str:
    return f"CASE WHEN {cond} THEN {_leaf(2, pa, sa)} ELSE {_leaf(1, pa, sa)} END"


def dm_rule_case_sql(w: str, n: str, p: str) -> str:
    """The full Double Metaphone main-loop rule table as one CASE over
    the character at cursor ``p``, evaluating to a :func:`_leaf`
    literal. ``w`` = padded uppercase word expr, ``n`` = unpadded
    length expr, ``p`` = 1-based cursor expr."""
    g = _Gen(w, n, p)
    c = g.ch(0)
    ch1 = g.ch(1)

    c_rules = f"""CASE
 WHEN {p} >= 3 AND NOT {g.vowel(-2)} AND {g.at(-1, 3, 'ACH')}
      AND {g.ch(2)} != 'I'
      AND ({g.ch(2)} != 'E' OR {g.at(-2, 6, 'BACHER', 'MACHER')})
   THEN {_leaf(2, 'K')}
 WHEN {p} = 1 AND {g.at(0, 6, 'CAESAR')} THEN {_leaf(2, 'S')}
 WHEN {g.at(0, 4, 'CHIA')} THEN {_leaf(2, 'K')}
 WHEN {g.at(0, 2, 'CH')} THEN CASE
   WHEN {p} > 1 AND {g.at(0, 4, 'CHAE')} THEN {_leaf(2, 'K', 'X')}
   WHEN {p} = 1 AND ({g.at(1, 5, 'HARAC', 'HARIS')}
        OR {g.at(1, 3, 'HOR', 'HYM', 'HIA', 'HEM')})
        AND NOT {g.at0(0, 5, 'CHORE')} THEN {_leaf(2, 'K')}
   WHEN {g.at0(0, 4, 'VAN ', 'VON ')} OR {g.at0(0, 3, 'SCH')}
        OR {g.at(-2, 6, 'ORCHES', 'ARCHIT', 'ORCHID')}
        OR {g.at(2, 1, 'T', 'S')}
        OR (({g.at(-1, 1, 'A', 'O', 'U', 'E')} OR {p} = 1)
            AND {g.at(2, 1, 'L', 'R', 'N', 'M', 'B', 'H', 'F', 'V', 'W', ' ')})
     THEN {_leaf(2, 'K')}
   WHEN {p} > 1 THEN CASE WHEN {g.at0(0, 2, 'MC')} THEN {_leaf(2, 'K')}
                          ELSE {_leaf(2, 'X', 'K')} END
   ELSE {_leaf(2, 'X')} END
 WHEN {g.at(0, 2, 'CZ')} AND NOT {g.at(-2, 4, 'WICZ')}
   THEN {_leaf(2, 'S', 'X')}
 WHEN {g.at(1, 3, 'CIA')} THEN {_leaf(3, 'X')}
 WHEN {g.at(0, 2, 'CC')} AND NOT ({p} = 2 AND {g.chabs(0)} = 'M') THEN CASE
   WHEN {g.at(2, 1, 'I', 'E', 'H')} AND NOT {g.at(2, 2, 'HU')} THEN
     CASE WHEN ({p} = 2 AND {g.ch(-1)} = 'A')
               OR {g.at(-1, 5, 'UCCEE', 'UCCES')} THEN {_leaf(3, 'KS')}
          ELSE {_leaf(3, 'X')} END
   ELSE {_leaf(2, 'K')} END
 WHEN {g.at(0, 2, 'CK', 'CG', 'CQ')} THEN {_leaf(2, 'K')}
 WHEN {g.at(0, 2, 'CI', 'CE', 'CY')} THEN
   CASE WHEN {g.at(0, 3, 'CIO', 'CIE', 'CIA')} THEN {_leaf(2, 'S', 'X')}
        ELSE {_leaf(2, 'S')} END
 ELSE CASE
   WHEN {g.at(1, 2, ' C', ' Q', ' G')} THEN {_leaf(3, 'K')}
   WHEN {g.at(1, 1, 'C', 'K', 'Q')} AND NOT {g.at(1, 2, 'CE', 'CI')}
     THEN {_leaf(2, 'K')}
   ELSE {_leaf(1, 'K')} END
 END"""

    g_rules = f"""CASE
 WHEN {ch1} = 'H' THEN CASE
   WHEN {p} > 1 AND NOT {g.vowel(-1)} THEN {_leaf(2, 'K')}
   WHEN {p} = 1 THEN CASE WHEN {g.ch(2)} = 'I' THEN {_leaf(2, 'J')}
                          ELSE {_leaf(2, 'K')} END
   WHEN ({p} >= 3 AND {g.at(-2, 1, 'B', 'H', 'D')})
        OR ({p} >= 4 AND {g.at(-3, 1, 'B', 'H', 'D')})
        OR ({p} >= 5 AND {g.at(-4, 1, 'B', 'H')}) THEN {_leaf(2, '')}
   WHEN {p} > 3 AND {g.ch(-1)} = 'U'
        AND {g.at(-3, 1, 'C', 'G', 'L', 'R', 'T')} THEN {_leaf(2, 'F')}
   WHEN {p} > 1 AND {g.ch(-1)} != 'I' THEN {_leaf(2, 'K')}
   ELSE {_leaf(2, '')} END
 WHEN {ch1} = 'N' THEN CASE
   WHEN {p} = 2 AND {g.vowel_abs(0)} AND NOT {g.sg()}
     THEN {_leaf(2, 'KN', 'N')}
   WHEN NOT {g.at(2, 2, 'EY')} AND NOT {g.sg()} THEN {_leaf(2, 'N', 'KN')}
   ELSE {_leaf(2, 'KN')} END
 WHEN {g.at(1, 2, 'LI')} AND NOT {g.sg()} THEN {_leaf(2, 'KL', 'L')}
 WHEN {p} = 1 AND ({ch1} = 'Y'
      OR {g.at(1, 2, 'ES', 'EP', 'EB', 'EL', 'EY', 'IB', 'IL', 'IN',
               'IE', 'EI', 'ER')}) THEN {_leaf(2, 'K', 'J')}
 WHEN ({g.at(1, 2, 'ER')} OR {ch1} = 'Y')
      AND NOT {g.at0(0, 6, 'DANGER', 'RANGER', 'MANGER')}
      AND NOT {g.at(-1, 1, 'E', 'I')}
      AND NOT {g.at(-1, 3, 'RGY', 'OGY')} THEN {_leaf(2, 'K', 'J')}
 WHEN {g.at(1, 1, 'E', 'I', 'Y')} OR {g.at(-1, 4, 'AGGI', 'OGGI')} THEN CASE
   WHEN {g.at0(0, 4, 'VAN ', 'VON ')} OR {g.at0(0, 3, 'SCH')}
        OR {g.at(1, 2, 'ET')} THEN {_leaf(2, 'K')}
   WHEN {g.at(1, 4, 'IER ')} THEN {_leaf(2, 'J')}
   ELSE {_leaf(2, 'J', 'K')} END
 WHEN {ch1} = 'G' THEN {_leaf(2, 'K')}
 ELSE {_leaf(1, 'K')} END"""

    j_rules = f"""CASE
 WHEN {g.at(0, 4, 'JOSE')} OR {g.at0(0, 4, 'SAN ')} THEN
   CASE WHEN ({p} = 1 AND {g.ch(4)} = ' ') OR {g.at0(0, 4, 'SAN ')}
          THEN {_leaf(1, 'H')}
        ELSE {_leaf(1, 'J', 'H')} END
 WHEN {p} = 1 THEN {_adv2if(f"{ch1} = 'J'", 'J', 'A')}
 WHEN {g.vowel(-1)} AND NOT {g.sg()} AND ({ch1} = 'A' OR {ch1} = 'O')
   THEN {_adv2if(f"{ch1} = 'J'", 'J', 'H')}
 WHEN {p} = {n} THEN {_leaf(1, 'J', '')}
 WHEN NOT {g.at(1, 1, 'L', 'T', 'K', 'S', 'N', 'M', 'B', 'Z')}
      AND NOT {g.at(-1, 1, 'S', 'K', 'L')}
   THEN {_adv2if(f"{ch1} = 'J'", 'J')}
 ELSE {_adv2if(f"{ch1} = 'J'", '')} END"""

    s_rules = f"""CASE
 WHEN {g.at(-1, 3, 'ISL', 'YSL')} THEN {_leaf(1, '')}
 WHEN {p} = 1 AND {g.at(0, 5, 'SUGAR')} THEN {_leaf(1, 'X', 'S')}
 WHEN {g.at(0, 2, 'SH')} THEN
   CASE WHEN {g.at(1, 4, 'HEIM', 'HOEK', 'HOLM', 'HOLZ')}
          THEN {_leaf(2, 'S')}
        ELSE {_leaf(2, 'X')} END
 WHEN {g.at(0, 3, 'SIO', 'SIA')} OR {g.at(0, 4, 'SIAN')} THEN
   CASE WHEN NOT {g.sg()} THEN {_leaf(3, 'S', 'X')}
        ELSE {_leaf(3, 'S')} END
 WHEN ({p} = 1 AND {g.at(1, 1, 'M', 'N', 'L', 'W')}) OR {g.at(1, 1, 'Z')}
   THEN CASE WHEN {g.at(1, 1, 'Z')} THEN {_leaf(2, 'S', 'X')}
             ELSE {_leaf(1, 'S', 'X')} END
 WHEN {g.at(0, 2, 'SC')} THEN CASE
   WHEN {g.ch(2)} = 'H' THEN CASE
     WHEN {g.at(3, 2, 'OO', 'ER', 'EN', 'UY', 'ED', 'EM')} THEN
       CASE WHEN {g.at(3, 2, 'ER', 'EN')} THEN {_leaf(3, 'X', 'SK')}
            ELSE {_leaf(3, 'SK')} END
     WHEN {p} = 1 AND NOT {g.vowel_abs(3)} AND {g.chabs(3)} != 'W'
       THEN {_leaf(3, 'X', 'S')}
     ELSE {_leaf(3, 'X')} END
   WHEN {g.at(2, 1, 'I', 'E', 'Y')} THEN {_leaf(3, 'S')}
   ELSE {_leaf(3, 'SK')} END
 WHEN {p} = {n} AND {g.at(-2, 2, 'AI', 'OI')} THEN {_leaf(1, '', 'S')}
 WHEN {g.at(1, 1, 'S', 'Z')} THEN {_leaf(2, 'S')}
 ELSE {_leaf(1, 'S')} END"""

    return f"""CASE
WHEN {c} IN {_VOWELS} THEN
  CASE WHEN {p} = 1 THEN {_leaf(1, 'A')} ELSE {_leaf(1, '')} END
WHEN {c} = 'B' THEN {_adv2if(f"{ch1} = 'B'", 'P')}
WHEN {c} = 'C' THEN {c_rules}
WHEN {c} = 'D' THEN CASE
  WHEN {g.at(0, 2, 'DG')} THEN
    CASE WHEN {g.at(2, 1, 'I', 'E', 'Y')} THEN {_leaf(3, 'J')}
         ELSE {_leaf(2, 'TK')} END
  WHEN {g.at(0, 2, 'DT', 'DD')} THEN {_leaf(2, 'T')}
  ELSE {_leaf(1, 'T')} END
WHEN {c} = 'F' THEN {_adv2if(f"{ch1} = 'F'", 'F')}
WHEN {c} = 'G' THEN {g_rules}
WHEN {c} = 'H' THEN
  CASE WHEN ({p} = 1 OR {g.vowel(-1)}) AND {g.vowel(1)}
         THEN {_leaf(2, 'H')}
       ELSE {_leaf(1, '')} END
WHEN {c} = 'J' THEN {j_rules}
WHEN {c} = 'K' THEN {_adv2if(f"{ch1} = 'K'", 'K')}
WHEN {c} = 'L' THEN CASE
  WHEN {ch1} = 'L' THEN CASE
    WHEN ({p} = {n} - 2 AND {g.at(-1, 4, 'ILLO', 'ILLA', 'ALLE')})
         OR (({g.at_last(-1, 2, 'AS', 'OS')} OR {g.at_last(0, 1, 'A', 'O')})
             AND {g.at(-1, 4, 'ALLE')}) THEN {_leaf(2, 'L', '')}
    ELSE {_leaf(2, 'L')} END
  ELSE {_leaf(1, 'L')} END
WHEN {c} = 'M' THEN
  CASE WHEN ({g.at(-1, 3, 'UMB')}
             AND ({p} + 1 = {n} OR {g.at(2, 2, 'ER')}))
            OR {ch1} = 'M' THEN {_leaf(2, 'M')}
       ELSE {_leaf(1, 'M')} END
WHEN {c} = 'N' THEN {_adv2if(f"{ch1} = 'N'", 'N')}
WHEN {c} = 'P' THEN CASE
  WHEN {ch1} = 'H' THEN {_leaf(2, 'F')}
  WHEN {g.at(1, 1, 'P', 'B')} THEN {_leaf(2, 'P')}
  ELSE {_leaf(1, 'P')} END
WHEN {c} = 'Q' THEN {_adv2if(f"{ch1} = 'Q'", 'K')}
WHEN {c} = 'R' THEN CASE
  WHEN {p} = {n} AND NOT {g.sg()} AND {g.at(-2, 2, 'IE')}
       AND NOT {g.at(-4, 2, 'ME', 'MA')} THEN {_leaf(1, '', 'R')}
  WHEN {ch1} = 'R' THEN {_leaf(2, 'R')}
  ELSE {_leaf(1, 'R')} END
WHEN {c} = 'S' THEN {s_rules}
WHEN {c} = 'T' THEN CASE
  WHEN {g.at(0, 4, 'TION')} THEN {_leaf(3, 'X')}
  WHEN {g.at(0, 3, 'TIA', 'TCH')} THEN {_leaf(3, 'X')}
  WHEN {g.at(0, 2, 'TH')} OR {g.at(0, 3, 'TTH')} THEN
    CASE WHEN {g.at(2, 2, 'OM', 'AM')} OR {g.at0(0, 4, 'VAN ', 'VON ')}
              OR {g.at0(0, 3, 'SCH')} THEN {_leaf(2, 'T')}
         ELSE {_leaf(2, '0', 'T')} END
  WHEN {g.at(1, 1, 'T', 'D')} THEN {_leaf(2, 'T')}
  ELSE {_leaf(1, 'T')} END
WHEN {c} = 'V' THEN {_adv2if(f"{ch1} = 'V'", 'F')}
WHEN {c} = 'W' THEN CASE
  WHEN {g.at(0, 2, 'WR')} THEN {_leaf(2, 'R')}
  WHEN {p} = 1 AND ({g.vowel(1)} OR {g.at(0, 2, 'WH')}) THEN
    CASE WHEN {g.vowel(1)} THEN {_leaf(1, 'A', 'F')}
         ELSE {_leaf(1, 'A')} END
  WHEN ({p} = {n} AND {g.vowel(-1)})
       OR {g.at(-1, 5, 'EWSKI', 'EWSKY', 'OWSKI', 'OWSKY')}
       OR {g.at0(0, 3, 'SCH')} THEN {_leaf(1, '', 'F')}
  WHEN {g.at(0, 4, 'WICZ', 'WITZ')} THEN {_leaf(4, 'TS', 'FX')}
  ELSE {_leaf(1, '')} END
WHEN {c} = 'X' THEN CASE
  WHEN {p} = {n} AND ({g.at(-3, 3, 'IAU', 'EAU')}
                      OR {g.at(-2, 2, 'AU', 'OU')}) THEN {_leaf(1, '')}
  WHEN {g.at(1, 1, 'C', 'X')} THEN {_leaf(2, 'KS')}
  ELSE {_leaf(1, 'KS')} END
WHEN {c} = 'Z' THEN CASE
  WHEN {ch1} = 'H' THEN {_leaf(2, 'J')}
  WHEN {g.at(1, 2, 'ZO', 'ZI', 'ZA')}
       OR ({g.sg()} AND {p} > 1 AND {g.ch(-1)} != 'T')
    THEN {_adv2if(f"{ch1} = 'Z'", 'S', 'TS')}
  WHEN {ch1} = 'Z' THEN {_leaf(2, 'S')}
  ELSE {_leaf(1, 'S')} END
ELSE {_leaf(1, '')}
END"""


def dm_init_sql(w: str) -> tuple[str, str]:
    """(cursor0, code0) start-of-word expressions: skip the silent
    first letter of GN-/KN-/PN-/WR-/PS-, and initial X encodes as S."""
    p0 = (
        f"CASE WHEN substring({w}, 1, 2) IN ('GN', 'KN', 'PN', 'WR', 'PS')"
        f" THEN 2 WHEN substring({w}, 1, 1) = 'X' THEN 2 ELSE 1 END"
    )
    c0 = f"CASE WHEN substring({w}, 1, 1) = 'X' THEN 'S' ELSE '' END"
    return p0, c0


def with_double_metaphone(
    df: DataFrame,
    name_col: str,
    out_primary: str = "dm_primary",
    out_secondary: str = "dm_secondary",
) -> DataFrame:
    """Append the 4-char Double Metaphone primary and secondary codes
    of ``name_col`` via one JVM ``aggregate`` fold of the shared rule
    table (state = (cursor, primary, secondary); each step let-binds
    the rule outcome with the transform-of-one-element idiom so the
    CASE tree is evaluated once per step)."""
    d = df.withColumn(
        "_dmw", F.expr(f"concat(upper({name_col}), '     ')")
    ).withColumn("_dmn", F.expr(f"length({name_col})"))
    p0, c0 = dm_init_sql("_dmw")
    rule = dm_rule_case_sql("_dmw", "_dmn", "st.p")
    step = (
        f"element_at(transform(array({rule}), r -> named_struct("
        "'p', st.p + CAST(substring(r, 1, 1) AS INT),"
        " 'pri', concat(st.pri, replace(substring(r, 2, 2), '.', '')),"
        " 'sec', concat(st.sec, replace(substring(r, 4, 2), '.', '')))), 1)"
    )
    fold = (
        f"aggregate(sequence(1, greatest(_dmn, 1)),"
        f" named_struct('p', {p0}, 'pri', {c0}, 'sec', {c0}),"
        f" (st, x) -> CASE WHEN st.p > _dmn THEN st ELSE {step} END,"
        f" st -> st)"
    )
    d = d.withColumn("_dmst", F.expr(fold))
    return (
        d.withColumn(out_primary, F.expr("substring(_dmst.pri, 1, 4)"))
        .withColumn(out_secondary, F.expr("substring(_dmst.sec, 1, 4)"))
        .drop("_dmw", "_dmn", "_dmst")
    )
