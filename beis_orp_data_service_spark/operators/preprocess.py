"""Title/keyword preprocess chain — the reference's last un-ported
enrichment surface (title_generation/preprocess/preprocess_functions.py:12-40,
reused by keyword_extraction.py:60-81): strip regulator names, detect
malformed per-character text and dictionary-resplit it, then drop
excess punctuation.

Spark-first shape:

- regulator strip is ONE declarative fold (``F.aggregate`` over an
  array of literals) — a constant-size expression instead of a
  340-deep nested-replace tree that would blow the whole-stage-codegen
  method limit; it evaluates in a single projection pass either way.
- the malformed detector is a pure column predicate.
- the resplit is the engine's Viterbi DP kernel (one Arrow pass over
  ONLY the malformed rows) against a corpus-trained word dictionary.
  The reference calls wordninja — a DP word-split against a bundled
  English frequency list; the engine runs the same algorithm family
  but trains the frequency dictionary ON the corpus itself
  (:func:`~...operators.corpus.word_scores`), which keeps the operator
  self-contained, deterministic, and hash-checkable (documented
  deviation: different dictionary, same split semantics).
"""

from __future__ import annotations

import csv
import os
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beis_orp_data_service_spark.checkpointing import stage_checkpoint
from beis_orp_data_service_spark.functions.text import (
    remove_excess_punct,
    remove_excess_punct_sql,
)
from beis_orp_data_service_spark.operators.corpus import (
    _viterbi_split,
    word_scores,
)

# Python str.strip() whitespace — every codepoint where str.isspace()
# is true. The reference's malformed-text detector calls text.strip()
# (preprocess_functions.py:25-40), so EXACT parity needs this full set,
# not just the ASCII class the engine's tokenizer convention uses
# elsewhere (a title opening with e.g. \xa0 before five single-char
# tokens must still trip the detector). Rendered as \x{..} escapes,
# which Java regex (Spark) and RE2 (DuckDB) both accept — one pattern
# string drives both engines and no raw control characters land in SQL.
_PY_STRIP_CODEPOINTS: tuple[int, ...] = (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
    0x85, 0xA0, 0x1680,
    *range(0x2000, 0x200B), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
)
_PY_WS_CLASS = (
    "[" + "".join(f"\\x{{{c:x}}}" for c in _PY_STRIP_CODEPOINTS) + "]"
)
_WS_EDGE = f"^{_PY_WS_CLASS}+|{_PY_WS_CLASS}+$"

#: The reference's regulator-name list verbatim (data file
#: title_generation/preprocess/regulator_name_list.txt — domain
#: constants the engine must reproduce for drop-in parity). Order
#: matters: the reference replaces "Logo of the <name>" variants
#: first, then the bare names, sequentially.
REGULATOR_NAMES: list[str] = [
    'Charity Commission for England and Wales',
    'Charity Commission for Northern Ireland',
    'Office of the Scottish Charity Regulator',
    'The General Teaching Councils for Scotland, Wales and Northern Ireland',
    'Ofqual – Office of Qualifications and Examinations Regulation',
    "Ofsted – Office for Standards in Education, Children's Services and Skills",
    'Office for Students (OfS)',
    'Office for Students',
    'Environment Agency (EA)',
    'Environment Agency',
    'Department for Communities and Local Government',
    'Marine Management Organisation (MMO)',
    'Marine Management Organisation',
    'Office for Product Safety & Standards',
    'Office for Product Safety and Standards',
    'Natural Resources Wales (NRW)',
    'Natural Resources Wales',
    'Northern Ireland Environment Agency (NIEA)',
    'Northern Ireland Environment Agency',
    'Scottish Environment Protection Agency (SEPA)',
    'Scottish Environment Protection Agency',
    'Financial Conduct Authority (FCA)',
    'Financial Conduct Authority',
    'The Office for Professional Body Anti-Money Laundering Supervision (OPBAS)',
    'The Office for Professional Body Anti-Money Laundering Supervision',
    'Financial Reporting Council',
    'Reporting and Governance Authority',
    'Reporting & Governance Authority',
    'Institute of Chartered Accountants in England and Wales',
    'Institute of Chartered Accountants in England & Wales',
    'Office of the Regulator of Community Interest Companies (ORCIC)',
    'Office of the Regulator of Community Interest Companies',
    'Payment Systems Regulator (PSR)',
    'Payment Systems Regulator',
    'Pensions Regulator',
    'The Pensions Regulator',
    "Information Commissioner's Office",
    "Information Commissioner's Office (ICO)",
    'Prudential Regulation Authority (PRA)',
    'Prudential Regulation Authority',
    'Care Quality Commission (CQC)',
    'Care Quality Commission',
    'Complementary and Natural Healthcare Council (CNHC)',
    'Complementary & Natural Healthcare Council (CNHC)',
    'Complementary and Natural Healthcare Council',
    'Complementary & Natural Healthcare Council',
    'General Chiropractic Council (GCC)',
    'General Chiropractic Council',
    'General Dental Council (GDC)',
    'General Dental Council',
    'General Medical Council (GMC)',
    'General Medical Council',
    'General Optical Council (GOC)',
    'General Optical Council',
    'General Osteopathic Council (GOsC)',
    'General Osteopathic Council',
    'General Pharmaceutical Council (GPhC)',
    'General Pharmaceutical Council',
    'Health and Care Professions Council (HCPC)',
    'Health & Care Professions Council (HCPC)',
    'Health and Care Professions Council',
    'Health & Care Professions Council',
    'Health and Safety Executive',
    'Health & Safety Executive',
    'Healthcare Inspectorate Wales (HIW)',
    'Healthcare Inspectorate Wales',
    'Healthcare Safety Investigation Branch (HSIB)',
    'Healthcare Safety Investigation Branch',
    'Human Fertilisation and Embryology Authority',
    'Human Fertilisation & Embryology Authority',
    'Human Tissue Authority (HTA)',
    'Human Tissue Authority',
    'Medicines and Healthcare products Regulatory Agency (MHRA)',
    'Medicines and Healthcare products Regulatory Agency',
    'Medicines & Healthcare products Regulatory Agency',
    'NHS Improvement (NHSI)',
    'NHS Improvement',
    'Nursing and Midwifery Council (NMC)',
    'Nursing and Midwifery Council',
    'Nursing & Midwifery Council',
    'Pharmaceutical Society of Northern Ireland (PSNI)',
    'Pharmaceutical Society of Northern Ireland',
    'Professional Standards Authority for Health and Social Care',
    'Royal College of Veterinary Surgeons (RCVS)',
    'Royal College of Veterinary Surgeons',
    'UK Health Security Agency (UKHSA)',
    'UK Health Security Agency',
    'Regulator of Social Housing',
    'Scottish Housing Regulator',
    'Authorised Conveyancing Practitioners Board',
    'Bar Standards Board',
    'CILEx Regulation',
    'Faculty of Advocates',
    'Law Society of Northern Ireland',
    'Law Society of Scotland',
    'Master of the Faculties',
    'Office of the Immigration Services Commissioner',
    'Solicitors Regulation Authority',
    'Costs Lawyer Standards Board[3]',
    'Council for Licensed Conveyancers',
    'Scottish Care Inspectorate',
    'Care Council for Wales (CCW)',
    'Care Council for Wales',
    'Social Work England',
    'Northern Ireland Social Care Council (NISCC)',
    'Northern Ireland Social Care Council',
    'Scottish Social Services Council (SSSC)',
    'Scottish Social Services Council',
    'Civil Aviation Authority (CAA)',
    'Civil Aviation Authority',
    'Office of Rail and Road (ORR)',
    'Office of Rail and Road',
    'Office of Rail & Road',
    'Ofcom – independent regulator and competition authority for the UK communications industries',
    'Ofcom',
    'Phone-paid Services Authority – regulator for phone-paid services in the UK, part of Ofcom, replaces ICSTIS, PhonepayPlus',
    'Phone-paid Services Authority',
    'Office for Nuclear Regulation (ONR)',
    'Office for Nuclear Regulation',
    'Office for Product Safety & Standards',
    'Ofgem – the Office of the Gas and Electricity Markets',
    'Ofgem',
    'Ofwat – the Water Services Regulation Authority',
    'Ofwat',
    'The Utility Regulator – regulating electricity, gas, water and sewerage industries in Northern Ireland',
    'The Utility Regulator',
    'Water Industry Commission for Scotland',
    'Accreditation Service',
    'Advertising Standards Authority',
    'British Board of Film Classification',
    'Chartered Institute for the Management of Sport and Physical Activity',
    'Competition and Markets Authority',
    'Council for Registered Gas Installers',
    'Direct Marketing Authority',
    'Engineering Council – the regulatory body for the engineering profession',
    'Engineering Council',
    'Equality and Human Rights Commission',
    'Equality & Human Rights Commission',
    'Food Standards Agency',
    'Forensic Science Regulator',
    'Fundraising Regulator',
    'Gambling Commission',
    'Gangmasters and Labour Abuse Authority',
    'HM Revenue and Customs',
    'HM Revenue & Customs',
    'IMPRESS',
    'Independent Press Standards Organisation',
    "Information Commissioner's Office",
    'North Sea Transition Authority',
    'Planning Inspectorate',
    'Independent Office for Police Conduct',
    'Security Industry Authority',
]


def regulator_replace_list(names: list[str] | None = None) -> list[str]:
    """The exact replacement sequence the reference builds at import
    time (preprocess_functions.py:5-9): 'Logo of the ' variants first,
    then the bare names."""
    names = REGULATOR_NAMES if names is None else list(names)
    return ["Logo of the " + n for n in names] + names


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def strip_regulator_names(
    col: Column | str, names: list[str] | None = None
) -> Column:
    """``removing_regulator_names`` (preprocess_functions.py:12-22):
    delete every regulator name from the text, 'Logo of the ' variants
    first, as ORDERED literal replaces — expressed as one
    ``F.aggregate`` fold over the broadcast-literal name array (a
    constant-size expression; a nested-replace chain of 300+ calls
    would exceed the codegen method limit and go interpreted anyway).

    This is the EXPRESSION spelling — the oracle twin and the
    equality pin for :func:`strip_regulator_names_arrow`, which the
    engine path uses (r14, guide §4.2: the 304-replace HOF fold is
    interpreted per element; the Arrow kernel's C-level
    ``str.replace`` loop measured ~2× faster warm on real documents
    and is bit-equal — ASCII literal replaces are
    encoding-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    reps = F.array(*[F.lit(n) for n in regulator_replace_list(names)])
    return F.aggregate(reps, c, lambda acc, x: F.replace(acc, x, F.lit("")))


def strip_regulator_names_arrow(
    col: Column | str, names: list[str] | None = None
) -> Column:
    """Arrow twin of :func:`strip_regulator_names` — the same ORDERED
    literal replaces per row, run as Python ``str.replace`` (C loop)
    over Arrow batches instead of an interpreted JVM HOF fold.
    Equality-tested against the expression spelling (real docs + seam/
    empty/null edge cases, tests/test_preprocess.py)."""
    reps = regulator_replace_list(names)

    @F.pandas_udf("string")
    def _strip(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t:
                for n in reps:
                    t = t.replace(n, "")
            out.append(t)
        return pd.Series(out, dtype=object)

    c = F.col(col) if isinstance(col, str) else col
    return _strip(c)


def strip_regulator_names_sql(
    expr: str, names: list[str] | None = None
) -> str:
    """DuckDB twin of :func:`strip_regulator_names` — the same ordered
    fold as ``list_reduce`` (the accumulator seeds from the first list
    element, so the text is prepended to the name list)."""
    lst = ", ".join(_sql_str(n) for n in regulator_replace_list(names))
    return (
        f"list_reduce(list_prepend({expr}, [{lst}]), "
        "(acc, x) -> replace(acc, x, ''))"
    )


def malformed_singles(col: Column | str) -> Column:
    """The reference's malformed-text detector
    (preprocess_functions.py:25-40 ``delete_single_characters``): text
    whose first FIVE single-space-split tokens are each one character
    is per-character-spaced garbage (a common PDF-extraction failure).
    Exact parity: the edge trim removes the FULL Python ``str.strip()``
    whitespace set (``_PY_STRIP_CODEPOINTS`` — ASCII plus \\x1c-\\x1f,
    \\x85, \\xa0 and the Unicode separators), and ``split(" ")`` keeps
    empty tokens (regex split on a literal single space), so runs of
    spaces yield len-0 tokens that correctly fail the ==1 test."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.regexp_replace(c, _WS_EDGE, ""), " ", -1)
    return (F.size(toks) >= 5) & F.forall(
        F.slice(toks, 1, 5), lambda t: F.length(t) == F.lit(1)
    )


def malformed_singles_sql(expr: str) -> str:
    """DuckDB twin of :func:`malformed_singles` — the same
    Python-``strip()`` edge-trim class (``_WS_EDGE`` carries only
    ``\\x{..}`` escapes, valid RE2, and no quote characters)."""
    ts = (
        "string_split(regexp_replace("
        f"{expr}, '{_WS_EDGE}', '', 'g'"
        "), ' ')"
    )
    return (
        f"(len({ts}) >= 5 AND "
        f"len([x for x in ({ts})[1:5] if length(x) != 1]) = 0)"
    )


# ---------------------------------------------------------------------------
# Bundled-dictionary resplit — the reference's exact wordninja 2.0.0
# algorithm against a PINNED public frequency list
# ---------------------------------------------------------------------------

#: Frozen word-frequency resource: ``rank,word,cost_micro`` where
#: ``cost_micro = round_half_up(ln(rank·ln(N))·1e6)`` — wordninja
#: 2.0.0's Zipf cost (``LanguageModel.__init__``:
#: ``log((i+1)*log(len(words)))``) quantized to integers AT FREEZE
#: TIME (scripts/gen_bundled_wordfreq.py), so Spark, DuckDB and the
#: Arrow kernel all read identical integers — no cross-engine float.
_WORDFREQ_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "english_wordfreq.csv",
)

#: wordninja 2.0.0 ``_SPLIT_RE = re.compile("[^a-zA-Z0-9']+")`` —
#: chunks are the complement (findall form); separators are DROPPED.
_WN_CHUNK_RE = re.compile(r"[a-zA-Z0-9']+")
_WN_CHUNK_SQL_RE = "[a-zA-Z0-9'']+"


@lru_cache(maxsize=1)
def bundled_word_costs() -> tuple[dict[str, int], int]:
    """Load the pinned frequency list once per process: ``(costs,
    maxword)`` where ``costs[word] = cost_micro`` (lowercase keys) and
    ``maxword`` bounds the DP lookback exactly like wordninja's
    ``self._maxword = max(len(x) for x in words)``. Treat as frozen —
    callers must not mutate."""
    with open(_WORDFREQ_PATH, newline="") as f:
        rows = list(csv.DictReader(f))
    costs = {r["word"]: int(r["cost_micro"]) for r in rows}
    return costs, max(len(w) for w in costs)


def _wn_chunk_tokens(
    chunk: str, costs: dict[str, int], maxword: int
) -> list[str]:
    """One chunk through wordninja 2.0.0's ``_split``: min-cost DP
    (lowercased lookup, unknown pieces cost ``9e999``) then the
    backtrack with its re-attach rules. Float-infinity semantics are
    reproduced exactly with an integer key ``(is_inf, cost_micro, l)``:
    any path through an unknown piece is "infinite" and all infinite
    candidates COMPARE EQUAL on cost (their accumulated finite part is
    normalized to 0), so ties fall to the shortest piece — precisely
    ``min((c + cost.get(piece, 9e999), k+1))`` under IEEE ``inf``.

    Backtrack re-attach, verbatim from the 2.0.0 source: a lone
    apostrophe piece never MERGES into the token on its right (the
    ``if not s[i-k:i] == "'"`` guard wraps only the merge logic, so the
    apostrophe is still emitted as its own token); a token equal to
    ``'s`` re-attaches to the piece before it; digit-final pieces merge
    into digit-initial right neighbours (re-joining number runs the DP
    split apart)."""
    best: list[tuple[int, int, int]] = [(0, 0, 0)]
    for i in range(1, len(chunk) + 1):
        cands = []
        for ln in range(1, min(maxword, i) + 1):
            pi, pc, _ = best[i - ln]
            c = costs.get(chunk[i - ln : i].lower())
            if pi or c is None:
                cands.append((1, 0, ln))
            else:
                cands.append((0, pc + c, ln))
        best.append(min(cands))
    out: list[str] = []
    i = len(chunk)
    while i > 0:
        ln = best[i][2]
        piece = chunk[i - ln : i]
        new_token = True
        if (
            piece != "'"
            and out
            and (
                out[-1] == "'s"
                or (piece[-1].isdigit() and out[-1][0].isdigit())
            )
        ):
            out[-1] = piece + out[-1]
            new_token = False
        if new_token:
            out.append(piece)
        i -= ln
    out.reverse()
    return out


def wordninja_split(
    s: str,
    costs: dict[str, int] | None = None,
    maxword: int | None = None,
) -> list[str]:
    """wordninja 2.0.0 ``split``: break on non-``[a-zA-Z0-9']`` runs
    (separators dropped), DP-split each chunk, flatten in order.
    Defaults to the bundled pinned dictionary."""
    if costs is None:
        costs, maxword = bundled_word_costs()
    if maxword is None:
        # Custom costs without an explicit bound: derive it the same way
        # wordninja does (self._maxword = max(len(x) for x in words)).
        maxword = max(map(len, costs)) if costs else 1
    return [
        tok
        for chunk in _WN_CHUNK_RE.findall(s or "")
        for tok in _wn_chunk_tokens(chunk, costs, maxword)
    ]


def _wn_sql_block(chunk_cte: str = "ch") -> str:
    """Shared oracle CTE chain for the bundled resplit — appended after
    a ``{chunk_cte}(doc_id, pos, chunk)`` CTE inside a WITH RECURSIVE:
    ``m`` (the pinned dictionary as a map, read straight from the
    frozen CSV), ``dc`` (distinct chunks), ``dptab`` (the min-cost DP
    as the engine's '|'-packed list_reduce fold — 3 fields
    ``is_inf|cost|len``, ``list_min`` over structs reproduces the
    ``(inf, cost, shortest-piece)`` comparison), ``bt`` (single-
    successor recursive backtrace CARRYING the re-attach accumulator:
    tab-delimited tokens built right-to-left, lone-apostrophe pieces
    appended, ``'s``/digit-digit neighbours concatenated without a
    delimiter), and ``sp`` (chunk → final split string)."""
    _, mw = bundled_word_costs()
    prev = (
        "string_split(string_split(acc, ',')"
        "[CAST(x AS INTEGER) - l + 1], '|')"
    )
    piece = "w[CAST(x AS INTEGER) - l + 1 : CAST(x AS INTEGER)]"
    unknown = f"({prev}[1] = '1' OR mp[lower({piece})][1] IS NULL)"
    cand = (
        f"[{{'i': CASE WHEN {unknown} THEN 1 ELSE 0 END,"
        f" 'c': CASE WHEN {unknown} THEN 0"
        f" ELSE CAST({prev}[2] AS BIGINT) + mp[lower({piece})][1] END,"
        " 'l': l}"
        f" for l in range(1, least({mw}, CAST(x AS INTEGER)) + 1)]"
    )
    head = "string_split(acc, chr(9))[1]"
    return f"""
    , m AS (
      SELECT map(list(word ORDER BY word),
                 list(cost_micro ORDER BY word)) AS mp
      FROM read_csv('{_WORDFREQ_PATH}', header = true,
                    columns = {{'rank': 'BIGINT', 'word': 'VARCHAR',
                                'cost_micro': 'BIGINT'}})
    ), dc AS (
      SELECT DISTINCT chunk AS w FROM {chunk_cte}
    ), dptab AS MATERIALIZED (
      SELECT w,
        list_reduce(
          list_prepend('0|0|0',
                       [CAST(i AS VARCHAR)
                        for i in range(1, length(w)+1)]),
          (acc, x) -> acc || ',' ||
            CAST(list_min({cand}).i AS VARCHAR) || '|' ||
            CAST(list_min({cand}).c AS VARCHAR) || '|' ||
            CAST(list_min({cand}).l AS VARCHAR)
        ) AS dp
      FROM dc CROSS JOIN m
      WHERE length(w) > 0
    ), bt AS (
      SELECT w, dp, length(w) AS pos, '' AS acc FROM dptab
      UNION ALL
      SELECT w, dp, pos - l,
        CASE WHEN piece <> '''' AND acc <> ''
                  AND ({head} = '''s'
                       OR (right(piece, 1) BETWEEN '0' AND '9'
                           AND left({head}, 1) BETWEEN '0' AND '9'))
               THEN piece || acc
             WHEN acc = '' THEN piece
             ELSE piece || chr(9) || acc END
      FROM (
        SELECT w, dp, pos, acc, l,
               w[pos - l + 1 : pos] AS piece
        FROM (
          SELECT w, dp, pos, acc,
                 CAST(string_split(string_split(dp, ',')[pos + 1],
                                   '|')[3] AS INTEGER) AS l
          FROM bt WHERE pos > 0
        )
      )
    ), sp AS (
      SELECT w AS chunk, replace(acc, chr(9), ' ') AS split
      FROM bt WHERE pos = 0
    )"""


def title_preprocess(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    names: list[str] | None = None,
    top_p: int = 50000,
    max_word_len: int = 12,
    unk_score_micro: int = -(10**9),
    dictionary: str = "corpus",
) -> DataFrame:
    """The full title-generation preprocess chain
    (preprocess_functions.py:56-66 ``preprocess``): regulator-name
    strip → malformed-text dictionary resplit → excess-punctuation
    sweep. Output ``(id, was_resplit, title_input)`` — the text the
    title model consumes, plus the branch flag.

    Scale shape (100 TB): the strip + detector are one codegen-side
    projection; the word dictionary is the parameter-bounded model
    artifact (``top_p`` rows, collected once, sparkContext.broadcast —
    the engine's model-weights convention); the Viterbi resplit kernel
    touches ONLY the malformed rows (one Arrow pass over a
    predicate-pushed branch — malformed docs are the rare failure
    mode, so the Python path is off the hot corpus). Unknown single
    characters score ``unk_score_micro`` (far below any trained
    ln-frequency score) so any string stays segmentable while known
    words dominate.

    ``dictionary`` picks the resplit model: ``"corpus"`` (default)
    trains the frequency table on the corpus itself (documented
    deviation — self-contained, no shipped model); ``"bundled"`` runs
    the reference's EXACT wordninja 2.0.0 algorithm (chunking on
    non-``[a-zA-Z0-9']``, min-cost Zipf DP, ``'s``/digit re-attach)
    against the pinned public frequency list shipped at
    ``resources/english_wordfreq.csv`` — identical algorithm, pinned
    public dictionary, so out-of-corpus vocabulary splits identically
    on every corpus. ``top_p``/``max_word_len``/``unk_score_micro``
    only apply to the corpus mode."""
    # three consumers below (dictionary, kept branch, malformed branch)
    # — the 300+-replace strip fold must run ONCE per row, not once per
    # consumer
    base = stage_checkpoint(
        df.select(
            F.col(id_col),
            strip_regulator_names_arrow(
                F.coalesce(F.col(text_col), F.lit("")), names
            ).alias("_t"),
        ).withColumn("_mal", malformed_singles(F.col("_t"))),
        label="title_preprocess:stripped",
    )
    if dictionary == "bundled":
        costs, mw = bundled_word_costs()
        bcosts = df.sparkSession.sparkContext.broadcast(costs)

        # NOTE: the kernel must reference only PLAIN module globals
        # (_WN_CHUNK_RE / _wn_chunk_tokens, pickled by value) — calling
        # wordninja_split here would drag its lru_cache-wrapped
        # bundled_word_costs global into the closure, and lru wrappers
        # pickle BY REFERENCE (qualified-name lookup), breaking workers
        # whose sys.path lacks the repo (the vanilla-session contract).
        def _resplit(batches):
            sc = bcosts.value
            for pdf in batches:
                out = [
                    " ".join(
                        tok
                        for chunk in _WN_CHUNK_RE.findall(
                            (t or "").replace(" ", "")
                        )
                        for tok in _wn_chunk_tokens(chunk, sc, mw)
                    )
                    for t in pdf["_t"]
                ]
                yield pd.DataFrame({id_col: pdf[id_col], "_t": out})

    elif dictionary == "corpus":
        dict_rows = word_scores(
            base.filter(~F.col("_mal")), "_t", top_p=top_p,
            max_word_len=max_word_len,
        ).collect()
        bscores = df.sparkSession.sparkContext.broadcast(
            {r["word"]: r["score_micro"] for r in dict_rows}
        )
        L, unk = max_word_len, unk_score_micro

        def _resplit(batches):
            sc = bscores.value
            for pdf in batches:
                out = []
                for t in pdf["_t"]:
                    w = (t or "").replace(" ", "")
                    out.append(
                        " ".join(_viterbi_split(w, sc, L, unk)) if w else ""
                    )
                yield pd.DataFrame({id_col: pdf[id_col], "_t": out})

    else:
        raise ValueError(f"unknown dictionary mode {dictionary!r}")

    schema = T.StructType(
        [base.schema[id_col], T.StructField("_t", T.StringType())]
    )
    kept = base.filter(~F.col("_mal")).select(id_col, "_t")
    resplit = base.filter(F.col("_mal")).select(id_col, "_t").mapInPandas(
        _resplit, schema
    )
    merged = kept.withColumn("was_resplit", F.lit(False)).unionByName(
        resplit.withColumn("was_resplit", F.lit(True))
    )
    return merged.select(
        F.col(id_col),
        F.col("was_resplit"),
        remove_excess_punct("_t").alias("title_input"),
    )


def title_preprocess_oracle_sql(
    inp_sql: str,
    names: list[str] | None = None,
    top_p: int = 50000,
    max_word_len: int = 12,
    unk_score_micro: int = -(10**9),
    dictionary: str = "corpus",
) -> str:
    """DuckDB twin of :func:`title_preprocess` over input relation
    ``inp_sql`` (a subquery yielding ``(doc_id, text)``): the strip is
    the same list_reduce fold, the detector the same predicate, the
    dictionary the same bounded top-P aggregation, and the Viterbi
    resplit replays the DP as the engine's standard '|'-packed
    list_reduce fold (3-field entries — the third pins WHICH piece wins
    full ties) followed by a single-successor recursive-CTE backtrace;
    the split string itself is reassembled with an ordered string_agg,
    so the actual resplit TEXT is hash-checked, not just its shape.

    ``dictionary="bundled"`` swaps the corpus-trained table for the
    pinned CSV resource and replays the full wordninja 2.0.0 shape
    instead: chunk explode, min-cost DP (``is_inf|cost|len`` packed
    entries), and the re-attach backtrace carried as a tab-delimited
    accumulator inside the recursive CTE (see :func:`_wn_sql_block`)."""
    if dictionary == "bundled":
        strip = strip_regulator_names_sql("coalesce(text, '')", names)
        mal = malformed_singles_sql("t")
        return f"""
    WITH RECURSIVE inp AS ({inp_sql}
    ), s1 AS (
      SELECT doc_id, {strip} AS t FROM inp
    ), s2 AS MATERIALIZED (
      SELECT doc_id, t, {mal} AS mal FROM s1
    ), malw AS (
      SELECT doc_id, replace(t, ' ', '') AS w FROM s2 WHERE mal
    ), ch AS MATERIALIZED (
      SELECT doc_id, e.p AS pos, e.c AS chunk
      FROM (
        SELECT doc_id,
               regexp_extract_all(w, '{_WN_CHUNK_SQL_RE}') AS arr
        FROM malw
      ), unnest([{{'p': i, 'c': arr[i]}}
                 for i in range(1, len(arr) + 1)]) AS t(e)
    ){_wn_sql_block("ch")}, resplit AS (
      SELECT ch.doc_id, string_agg(sp.split, ' ' ORDER BY ch.pos) AS t
      FROM ch JOIN sp USING (chunk)
      GROUP BY ch.doc_id
    ), merged AS (
      SELECT s2.doc_id, s2.mal AS was_resplit,
             CASE WHEN s2.mal THEN coalesce(r.t, '') ELSE s2.t END AS t
      FROM s2 LEFT JOIN resplit r ON s2.doc_id = r.doc_id
    )
    SELECT doc_id, was_resplit,
           {remove_excess_punct_sql('t')} AS title_input
    FROM merged
    """
    if dictionary != "corpus":
        raise ValueError(f"unknown dictionary mode {dictionary!r}")
    L = max_word_len
    edge = "'^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$'"
    strip = strip_regulator_names_sql("coalesce(text, '')", names)
    mal = malformed_singles_sql("t")
    prev = (
        "string_split(string_split(acc, ',')"
        "[CAST(x AS INTEGER) - l + 1], '|')"
    )
    piece = "w[CAST(x AS INTEGER) - l + 1 : CAST(x AS INTEGER)]"
    cand = (
        f"[{{'s': CAST({prev}[1] AS BIGINT)"
        f" + coalesce(mp[{piece}][1],"
        f" CASE WHEN l = 1 THEN CAST({unk_score_micro} AS BIGINT) END),"
        f" 'mn': -(CAST({prev}[2] AS BIGINT) + 1),"
        " 'ml': -l}"
        f" for l in range(1, least({L}, CAST(x AS INTEGER)) + 1)"
        f" if l = 1 OR mp[{piece}][1] IS NOT NULL]"
    )
    return f"""
    WITH RECURSIVE inp AS ({inp_sql}
    ), s1 AS (
      SELECT doc_id, {strip} AS t FROM inp
    ), s2 AS MATERIALIZED (
      SELECT doc_id, t, {mal} AS mal FROM s1
    ), w0 AS (
      SELECT unnest(string_split_regex(
               regexp_replace(t, {edge}, '', 'g'),
               '[ \\t\\n\\x0B\\f\\r]+')) AS w
      FROM s2 WHERE NOT mal
    ), wf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM w0 WHERE length(w) BETWEEN 1 AND {L}
      GROUP BY w ORDER BY freq DESC, w LIMIT {top_p}
    ), tot AS (SELECT CAST(sum(freq) AS BIGINT) AS tt FROM wf
    ), m AS (
      SELECT map(list(w ORDER BY w),
                 list(CAST(round(ln(CAST(freq AS DOUBLE) / tt) * 1000000)
                           AS BIGINT) ORDER BY w)) AS mp
      FROM wf, tot
    ), malw AS (
      SELECT doc_id, replace(t, ' ', '') AS w FROM s2 WHERE mal
    ), dptab AS (
      SELECT doc_id, w,
        list_reduce(
          list_prepend('0|0|0',
                       [CAST(i AS VARCHAR)
                        for i in range(1, length(w)+1)]),
          (acc, x) -> acc || ',' ||
            CAST(list_max({cand}).s AS VARCHAR) || '|' ||
            CAST(-list_max({cand}).mn AS VARCHAR) || '|' ||
            CAST(-list_max({cand}).ml AS VARCHAR)
        ) AS dp
      FROM malw CROSS JOIN m
      WHERE length(w) > 0
    ), bt AS (
      SELECT doc_id, w, dp, length(w) AS pos FROM dptab
      UNION ALL
      SELECT doc_id, w, dp,
             pos - CAST(string_split(string_split(dp, ',')[pos + 1],
                                     '|')[3] AS INTEGER)
      FROM bt WHERE pos > 0
    ), resplit AS (
      SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS t
      FROM (
        SELECT doc_id, pos, w[pos - l + 1 : pos] AS piece
        FROM (
          SELECT doc_id, w, pos,
                 CAST(string_split(string_split(dp, ',')[pos + 1],
                                   '|')[3] AS INTEGER) AS l
          FROM bt WHERE pos > 0
        )
      ) GROUP BY doc_id
    ), merged AS (
      SELECT s2.doc_id, s2.mal AS was_resplit,
             CASE WHEN s2.mal THEN coalesce(r.t, '') ELSE s2.t END AS t
      FROM s2 LEFT JOIN resplit r ON s2.doc_id = r.doc_id
    )
    SELECT doc_id, was_resplit,
           {remove_excess_punct_sql('t')} AS title_input
    FROM merged
    """


#: The three regulator names keyword extraction strips before the
#: resplit (keyword_extraction.py:64-66 hardcodes them as re.sub
#: patterns — all three are literal, incl. the reference's
#: 'Environmental Agency' spelling, kept verbatim).
KW_REGULATOR_SUBS: list[str] = [
    "Health and Safety Executive",
    "Ofgem",
    "Environmental Agency",
]

_KW_CHUNK_RE = "[a-zA-Z0-9']+"


def kw_preprocess(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_p: int = 50000,
    max_word_len: int = 12,
    unk_score_micro: int = -(10**9),
    dictionary: str = "corpus",
) -> DataFrame:
    """The keyword-extraction preprocess (keyword_extraction.py:64-67):
    strip the three hardcoded regulator names, then
    ``' '.join(wordninja.split(text))`` — wordninja tokenizes on
    non-``[a-zA-Z0-9']`` runs (punctuation is DROPPED), DP-splits every
    chunk against its frequency list, and the chunks rejoin with single
    spaces. Output ``(id, kw_input)``.

    Engine shape: one regexp_extract_all + posexplode keeps chunk
    order; the Viterbi DP runs once per DISTINCT chunk (one Arrow
    pass, dictionary = the corpus's own chunk-frequency table —
    parameter-bounded, broadcast; same documented wordninja-dictionary
    deviation as :func:`title_preprocess`); per-doc reassembly is one
    ordered aggregation. Glued compounds split back into dictionary
    words; already-known chunks stay whole (their own score beats any
    split).

    ``dictionary="bundled"`` swaps the corpus-trained chunk table for
    the pinned public frequency list and the exact wordninja 2.0.0
    kernel (min-cost DP + re-attach) — identical algorithm, pinned
    public dictionary; the corpus-mode knobs (``top_p`` etc.) do not
    apply."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    for n in KW_REGULATOR_SUBS:
        c = F.replace(c, F.lit(n), F.lit(""))
    # three consumers (dictionary, split join-back, ordered reassembly)
    # — strip + chunk explode run once per row
    chunks = stage_checkpoint(
        df.select(
            F.col(id_col),
            F.posexplode(
                F.regexp_extract_all(c, F.lit(_KW_CHUNK_RE), 0)
            ).alias("pos", "chunk"),
        ),
        label="kw_preprocess:chunks",
    )
    if dictionary == "bundled":
        costs, mw = bundled_word_costs()
        bcosts = df.sparkSession.sparkContext.broadcast(costs)

        def _split(batches):
            sc = bcosts.value
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "chunk": pdf["chunk"],
                        "split": [
                            " ".join(_wn_chunk_tokens(w, sc, mw))
                            for w in pdf["chunk"]
                        ],
                    }
                )

    elif dictionary == "corpus":
        dict_rows = (
            chunks.filter(
                (F.length("chunk") >= 1) & (F.length("chunk") <= max_word_len)
            )
            .groupBy("chunk")
            .agg(F.count("*").cast("bigint").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("chunk"))
            .limit(top_p)
        )
        total = dict_rows.agg(F.sum("freq").cast("bigint").alias("t"))
        model = dict_rows.join(F.broadcast(total)).select(
            "chunk",
            F.round(F.log(F.col("freq").cast("double") / F.col("t")) * 1e6)
            .cast("bigint")
            .alias("score_micro"),
        )
        bscores = df.sparkSession.sparkContext.broadcast(
            {r["chunk"]: r["score_micro"] for r in model.collect()}
        )
        L, unk = max_word_len, unk_score_micro

        def _split(batches):
            sc = bscores.value
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "chunk": pdf["chunk"],
                        "split": [
                            " ".join(_viterbi_split(w, sc, L, unk))
                            for w in pdf["chunk"]
                        ],
                    }
                )

    else:
        raise ValueError(f"unknown dictionary mode {dictionary!r}")

    splits = (
        chunks.select("chunk").distinct()
        .mapInPandas(_split, "chunk string, split string")
    )
    agg = (
        chunks.join(splits, "chunk")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "split"))),
                    lambda s: s["split"],
                ),
                " ",
            ).alias("kw_input")
        )
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("kw_input", F.lit("")).alias("kw_input"),
    )


def kw_preprocess_oracle_sql(
    inp_sql: str,
    top_p: int = 50000,
    max_word_len: int = 12,
    unk_score_micro: int = -(10**9),
    dictionary: str = "corpus",
) -> str:
    """DuckDB twin of :func:`kw_preprocess` over input relation
    ``inp_sql`` (``(doc_id, text)``): the same literal strip, ordinal
    chunk explode, bounded chunk-frequency dictionary, per-DISTINCT-
    chunk DP fold + recursive-CTE backtrace with ordered string_agg
    reassembly (chunk-level), then a doc-level ordered string_agg over
    chunk positions — the full resplit TEXT is hash-checked.
    ``dictionary="bundled"`` reads the pinned CSV dictionary and
    replays the wordninja 2.0.0 min-cost DP + re-attach backtrace
    (:func:`_wn_sql_block`) instead of the corpus-trained Viterbi."""
    L = max_word_len
    strip = "coalesce(text, '')"
    for n in KW_REGULATOR_SUBS:
        strip = f"replace({strip}, {_sql_str(n)}, '')"
    if dictionary == "bundled":
        return f"""
    WITH RECURSIVE inp AS ({inp_sql}
    ), ch AS MATERIALIZED (
      SELECT doc_id, e.p AS pos, e.c AS chunk
      FROM (
        SELECT doc_id,
               regexp_extract_all({strip}, '{_WN_CHUNK_SQL_RE}') AS arr
        FROM inp
      ), unnest([{{'p': i, 'c': arr[i]}}
                 for i in range(1, len(arr) + 1)]) AS t(e)
    ){_wn_sql_block("ch")}, agg AS (
      SELECT ch.doc_id,
             string_agg(sp.split, ' ' ORDER BY ch.pos) AS kw_input
      FROM ch JOIN sp USING (chunk)
      GROUP BY ch.doc_id
    )
    SELECT i.doc_id, coalesce(a.kw_input, '') AS kw_input
    FROM inp i LEFT JOIN agg a USING (doc_id)
    """
    if dictionary != "corpus":
        raise ValueError(f"unknown dictionary mode {dictionary!r}")
    prev = (
        "string_split(string_split(acc, ',')"
        "[CAST(x AS INTEGER) - l + 1], '|')"
    )
    piece = "w[CAST(x AS INTEGER) - l + 1 : CAST(x AS INTEGER)]"
    cand = (
        f"[{{'s': CAST({prev}[1] AS BIGINT)"
        f" + coalesce(mp[{piece}][1],"
        f" CASE WHEN l = 1 THEN CAST({unk_score_micro} AS BIGINT) END),"
        f" 'mn': -(CAST({prev}[2] AS BIGINT) + 1),"
        " 'ml': -l}"
        f" for l in range(1, least({L}, CAST(x AS INTEGER)) + 1)"
        f" if l = 1 OR mp[{piece}][1] IS NOT NULL]"
    )
    return f"""
    WITH RECURSIVE inp AS ({inp_sql}
    ), ch AS MATERIALIZED (
      SELECT doc_id, e.p AS pos, e.c AS chunk
      FROM (
        SELECT doc_id,
               regexp_extract_all({strip}, '[a-zA-Z0-9'']+') AS arr
        FROM inp
      ), unnest([{{'p': i, 'c': arr[i]}}
                 for i in range(1, len(arr) + 1)]) AS t(e)
    ), wf AS (
      SELECT chunk, CAST(count(*) AS BIGINT) AS freq
      FROM ch WHERE length(chunk) BETWEEN 1 AND {L}
      GROUP BY chunk ORDER BY freq DESC, chunk LIMIT {top_p}
    ), tot AS (SELECT CAST(sum(freq) AS BIGINT) AS tt FROM wf
    ), m AS (
      SELECT map(list(chunk ORDER BY chunk),
                 list(CAST(round(ln(CAST(freq AS DOUBLE) / tt) * 1000000)
                           AS BIGINT) ORDER BY chunk)) AS mp
      FROM wf, tot
    ), dc AS (
      SELECT DISTINCT chunk AS w FROM ch
    ), dptab AS (
      SELECT w,
        list_reduce(
          list_prepend('0|0|0',
                       [CAST(i AS VARCHAR)
                        for i in range(1, length(w)+1)]),
          (acc, x) -> acc || ',' ||
            CAST(list_max({cand}).s AS VARCHAR) || '|' ||
            CAST(-list_max({cand}).mn AS VARCHAR) || '|' ||
            CAST(-list_max({cand}).ml AS VARCHAR)
        ) AS dp
      FROM dc CROSS JOIN m
      WHERE length(w) > 0
    ), bt AS (
      SELECT w, dp, length(w) AS pos FROM dptab
      UNION ALL
      SELECT w, dp,
             pos - CAST(string_split(string_split(dp, ',')[pos + 1],
                                     '|')[3] AS INTEGER)
      FROM bt WHERE pos > 0
    ), sp AS (
      SELECT w AS chunk, string_agg(piece, ' ' ORDER BY pos) AS split
      FROM (
        SELECT w, pos, w[pos - l + 1 : pos] AS piece
        FROM (
          SELECT w, pos,
                 CAST(string_split(string_split(dp, ',')[pos + 1],
                                   '|')[3] AS INTEGER) AS l
          FROM bt WHERE pos > 0
        )
      ) GROUP BY w
    ), agg AS (
      SELECT ch.doc_id,
             string_agg(sp.split, ' ' ORDER BY ch.pos) AS kw_input
      FROM ch JOIN sp USING (chunk)
      GROUP BY ch.doc_id
    )
    SELECT i.doc_id, coalesce(a.kw_input, '') AS kw_input
    FROM inp i LEFT JOIN agg a USING (doc_id)
    """
