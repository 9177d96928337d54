"""Host-weather-robust bench regression gate (VERDICT r12 item 1).

The driver's per-round ``BENCH_r{N}.json`` artifacts are produced on an
UNCONTROLLED host: round 12's artifact was uniformly ~1.36x slower than
round 11's (median per-query ratio across the 57-query common window)
purely from driver-run host load, while the builder's clean same-code
ledger sat at round-11 parity.  A raw per-query 3x bar against such a
pair trips on weather, not plans.  Two defenses, both mandated by the
round-12 verdict (and its explicit instruction: do NOT loosen the 3x
bar itself):

1. **Median normalization** — every per-query ratio is judged against
   ``3 x max(1, median_ratio)``: a uniformly loaded run raises every
   query together, so dividing out the battery-wide median isolates
   per-query pathology (the round-2 40x sketch-gate class) from
   whole-battery weather.  The median is clamped at 1 so a FASTER
   current run never tightens the bar below the raw 3x.
2. **Fresh-session re-probe** — any name still flagged after
   normalization is re-measured ISOLATED (``SPARK_GRAFT_BENCH_ONLY``,
   fresh interpreter, idle-as-possible host) and fails only if the
   isolated wall confirms the RAW bar.  The re-probe result is cached
   in ``BENCH_reprobe_gate.json`` keyed by the md5s of the two
   artifacts, so the suite stays fast (and deterministic) until the
   driver drops a new artifact pair.

The flagship metric keeps its tighter 2x bar, normalized the same way.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import re
import statistics
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# raw (un-normalized) bars — the contract since round 2 / round 4
QUERY_FACTOR = 3.0     # per-query regression factor
QUERY_FLOOR_S = 1.5    # ignore sub-1.5s walls (fixed-cost noise)
FLAGSHIP_FACTOR = 2.0  # flagship regression factor (VERDICT r4)
FLAGSHIP_FLOOR_S = 1.0

CACHE_NAME = "BENCH_reprobe_gate.json"
FLAGSHIP_KEY = "__flagship_synth__"  # cache slot for the flagship probe


def parse_artifact(path: pathlib.Path):
    """(sink_mode, per-query timings, flagship_sec) from a driver bench
    artifact.  Driver artifacts keep only the TAIL of the bench JSON
    line (front-truncated), so per-query times are recovered by
    scanning "name": seconds pairs inside the queries object —
    everything before the closing ``}, "sink_mode":`` / ``}, "sf":``
    belongs to it.  bench.py >= r6 duplicates the sink mode AFTER the
    queries object precisely so truncation can't eat it (ADVICE r5)."""
    doc = json.loads(path.read_text())
    if isinstance(doc.get("parsed"), dict):
        p = doc["parsed"]
        return (p.get("sink_mode", p.get("sink")), p["queries"],
                p.get("flagship_synth_sec"))
    sink_m = (re.search(r'"sink_mode":\s*\\?"(\w+)', doc["tail"])
              or re.search(r'"sink":\s*\\?"(\w+)', doc["tail"]))
    fm = re.search(r'"flagship_synth_sec\\?":\s*(\d+(?:\.\d+)?)',
                   doc["tail"])
    tail = re.split(r'}, "(?:sink_mode|sf)":', doc["tail"])[0]
    return (sink_m.group(1) if sink_m else None,
            {m.group(1): float(m.group(2)) for m in re.finditer(
                r'"([a-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', tail)},
            float(fm.group(1)) if fm else None)


def weather_median(prev: dict, cur: dict) -> float:
    """Battery-wide median cur/prev ratio over the common names — the
    whole-run host-weather factor.  Clamped to >= 1.0 so a faster
    current run keeps the RAW bars (normalization only ever excuses
    uniform slowness, never tightens the gate).  Sub-0.1s entries are
    excluded from the median: their ratios are scheduling noise."""
    ratios = [cur[n] / prev[n] for n in prev.keys() & cur.keys()
              if prev[n] >= 0.1 and cur[n] > 0]
    return max(1.0, statistics.median(ratios)) if ratios else 1.0


def flag_queries(prev: dict, cur: dict, med: float) -> dict:
    """Names whose current wall exceeds the weather-normalized 3x bar
    (and the absolute floor): {name: (prev_s, cur_s)}."""
    return {
        n: (prev[n], cur[n])
        for n in prev.keys() & cur.keys()
        if prev[n] > 0
        and cur[n] > max(QUERY_FACTOR * med * prev[n], QUERY_FLOOR_S)
    }


def flagship_flagged(f_prev, f_cur, med: float) -> bool:
    return bool(
        f_prev and f_cur
        and f_cur > max(FLAGSHIP_FACTOR * med * f_prev, FLAGSHIP_FLOOR_S))


def _md5(path: pathlib.Path) -> str:
    return hashlib.md5(path.read_bytes()).hexdigest()


def cached_reprobe(prev_art: pathlib.Path, cur_art: pathlib.Path,
                   needed: set[str]) -> dict | None:
    """The committed re-probe cache, iff it was produced against
    exactly these artifact bytes and covers every needed name."""
    cache = REPO / CACHE_NAME
    if not cache.exists():
        return None
    try:
        doc = json.loads(cache.read_text())
    except json.JSONDecodeError:
        return None
    if (doc.get("prev_md5") != _md5(prev_art)
            or doc.get("cur_md5") != _md5(cur_art)):
        return None
    if not needed <= set(doc.get("isolated", {})):
        return None
    return doc


def run_reprobe(prev_art: pathlib.Path, cur_art: pathlib.Path,
                names: set[str], sink: str | None = None) -> dict:
    """Measure the flagged names in a FRESH interpreter/JVM via
    bench.py's ``SPARK_GRAFT_BENCH_ONLY``, write the cache artifact,
    return it.  The protocol is PINNED to the artifact pair's, not the
    ambient environment (round-13 review): sink = the artifacts' own
    sink mode (evaluate already guaranteed both sides match; None — a
    pre-r6 truncated pair — replays the driver default, collect), tier
    = the driver's sf0.1 regardless of any SPARK_GRAFT_SF_DIR a prior
    tier run left exported.  bench.py always appends the flagship
    synth metric, so a flagged flagship rides along for free
    (``FLAGSHIP_KEY`` slot).  A name that no longer exists in the
    registry (renamed/removed since the artifact) cannot be
    re-measured: it is recorded as -1.0, which ``evaluate`` treats as
    CONFIRMED — a loud failure beats a silent clear, and the cache
    still covers the name so the suite doesn't re-spawn the probe
    every run."""
    run_names = sorted(names - {FLAGSHIP_KEY})
    if not run_names:
        # flagship-only probe still needs ONE registered name so the
        # ONLY filter stays a valid non-empty battery
        run_names = ["flagship_groupby_mean_std"]
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ONLY=",".join(run_names),
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        # best-of-3: a single isolated run charges cold-JVM/codegen
        # warm-up to the one query measured, which the in-battery
        # baseline amortized across hundreds of queries
        SPARK_GRAFT_BENCH_REPS="3",
    )
    env.pop("SPARK_GRAFT_BENCH_SINK", None)
    if sink:
        env["SPARK_GRAFT_BENCH_SINK"] = sink
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO),
        timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(
            f"re-probe bench failed rc={out.returncode}: "
            f"{out.stderr[-2000:]}")
    line = out.stdout.strip().splitlines()[-1]
    bench = json.loads(line)
    isolated = {n: bench["queries"].get(n, -1.0) for n in run_names}
    isolated[FLAGSHIP_KEY] = bench["flagship_synth_sec"]
    doc = {
        "what": ("fresh-session isolated re-probe of bench-gate flagged "
                 "names (VERDICT r12 item 1): names that exceed the "
                 "weather-normalized bar between the two driver "
                 "artifacts are re-measured in an idle fresh JVM and "
                 "judged against the RAW bars; cache is keyed on the "
                 "artifact bytes so a new driver round invalidates it"),
        "prev_art": prev_art.name,
        "cur_art": cur_art.name,
        "prev_md5": _md5(prev_art),
        "cur_md5": _md5(cur_art),
        "isolated": isolated,
    }
    (REPO / CACHE_NAME).write_text(json.dumps(doc) + "\n")
    return doc


def evaluate(prev_art: pathlib.Path, cur_art: pathlib.Path,
             reprobe=run_reprobe) -> dict:
    """Full gate: returns a report dict; ``confirmed`` non-empty means
    a REAL (isolated-confirmed) regression.  ``reprobe`` is injectable
    for unit tests."""
    prev_sink, prev, f_prev = parse_artifact(prev_art)
    cur_sink, cur, f_cur = parse_artifact(cur_art)
    report: dict = {"sink": (prev_sink, cur_sink), "confirmed": {},
                    "flagged": {}, "median": None, "skip": None}
    # collect-sink vs noop-sink rounds are not comparable; when exactly
    # one side is unrecoverable, skip rather than guess (ADVICE r5)
    if (prev_sink is None) != (cur_sink is None):
        report["skip"] = "sink mode unrecoverable for one artifact"
        return report
    if prev_sink != cur_sink:
        report["skip"] = f"sink mismatch: {prev_sink!r} vs {cur_sink!r}"
        return report
    med = weather_median(prev, cur)
    report["median"] = med
    flagged = flag_queries(prev, cur, med)
    report["flagged"] = dict(flagged)
    fs_flag = flagship_flagged(f_prev, f_cur, med)
    report["flagship_flagged"] = fs_flag
    report["failed"] = [n for n, t in cur.items() if t < 0]
    need = set(flagged) | ({FLAGSHIP_KEY} if fs_flag else set())
    if not need:
        return report
    cache = cached_reprobe(prev_art, cur_art, need) or reprobe(
        prev_art, cur_art, need, sink=cur_sink)
    iso = cache["isolated"]
    # a flagged name whose isolated re-probe FAILED (-1.0: the query
    # crashed fresh, or was renamed out of the registry) must CONFIRM,
    # not silently clear (round-13 review) — the inline gate always
    # failed on a -1.0 artifact entry and the re-probe path keeps that
    confirmed = {
        n: (flagged[n][0], iso[n])
        for n in flagged
        if iso[n] < 0
        or iso[n] > max(QUERY_FACTOR * flagged[n][0], QUERY_FLOOR_S)
    }
    if fs_flag and iso[FLAGSHIP_KEY] > max(
            FLAGSHIP_FACTOR * f_prev, FLAGSHIP_FLOOR_S):
        confirmed[FLAGSHIP_KEY] = (f_prev, iso[FLAGSHIP_KEY])
    report["isolated"] = iso
    report["confirmed"] = confirmed
    return report
