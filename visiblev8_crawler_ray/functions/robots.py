"""robots.txt parsing + vectorized per-batch decisions (T7 depth).

The reference's stealth crawler deliberately ignores robots
(SURVEY.md T7; ``crawler.js`` fetches without a robots check) —
compliance is a north-rule-mandated stage of this engine.  The base
tier is ``CrawlConfig.robots_disallow`` (synthetic per-host prefix
rules, a pure function both the engine and the sequential oracle
evaluate).  This module is the REAL-FORMAT tier, exactly parallel to
how ``classify.AdblockIndex`` deepens T4 with easylist-format rules:

- :func:`parse_robots` implements the RFC 9309 subset that matters for
  a crawler: User-agent group selection (exact product token beats
  ``*``; multiple agent lines share a group; same-agent groups merge),
  Allow/Disallow with **longest-match-wins** (octet length of the
  pattern; ties break least-restrictive, i.e. Allow), ``*`` wildcards,
  a trailing ``$`` end anchor, empty-pattern rules ignored, and the
  de-facto ``Crawl-delay`` extension (seconds, fractional ok).
  Percent-encoding normalization is out of scope (documented).
- :func:`parse_corpus` reads a robots CACHE file — the concatenation a
  multi-host crawler holds after fetching each host's /robots.txt —
  with ``# === host: <name>`` section separators.
- :class:`RobotsIndex` is the stateful stage: rules compiled once per
  actor/task construction, decisions vectorized per distinct host
  (plain prefixes via ``np.char.startswith``, wildcard rules via one
  compiled regex each — rule counts are tiny next to row counts).
- :func:`robots_sql_exprs` GENERATES the DuckDB twin from the same
  parsed rules, so the SQL gate and the engine cannot drift.

When ``CrawlConfig.robots_file`` is set, the crawl's robots split and
the per-host politeness delay both consult these rules (parsed once
per process, memoized by path) — and the sequential oracle evaluates
the SAME objects, so crawl-order/seen-set equality is preserved by
construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

#: this engine's product token (what a robots User-agent line must name
#: to address us specifically).
UA_TOKEN = "vv8ray"


@dataclass(frozen=True)
class _Rule:
    allow: bool
    pattern: str          # raw robots pattern ('' never stored)
    # compiled matcher: None => plain prefix on `pattern`
    regex: re.Pattern | None

    @property
    def length(self) -> int:
        return len(self.pattern)


@dataclass
class HostRules:
    """The rule set SELECTED for our agent on one host, match-ready.
    ``rules`` is sorted (length asc, allow asc) so a later matching
    rule always legitimately overrides an earlier one — that single
    in-order overwrite implements longest-match-wins with Allow
    breaking ties."""

    rules: list[_Rule]
    crawl_delay_ms: int | None = None

    def allowed(self, path: str) -> bool:
        verdict = True
        for r in self.rules:
            if _match(r, path):
                verdict = r.allow
        return verdict


def _compile(pattern: str) -> re.Pattern | None:
    """robots pattern -> matcher.  Plain prefixes stay None (the
    vectorized startswith path); '*' / trailing '$' become one regex."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


def _match(rule: _Rule, path: str) -> bool:
    if rule.regex is None:
        return path.startswith(rule.pattern)
    return rule.regex.match(path) is not None


def parse_robots(text: str, agent: str = UA_TOKEN) -> HostRules:
    """Parse ONE robots.txt body and select the group for ``agent``.

    Group model (RFC 9309 §2.1): consecutive ``User-agent`` lines open
    a group; the group's rules run until the next ``User-agent`` line
    that follows at least one rule.  Groups addressing the same agent
    merge.  Selection: any group naming ``agent`` (case-insensitive
    token match) wins; else the ``*`` groups; else no rules."""
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        in_rules = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_rules = True
            if value:  # empty pattern = no rule (RFC: matches nothing)
                cur_rules.append((field == "allow", value))
        elif field == "crawl-delay":
            in_rules = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass
        # unknown fields (sitemap etc.): ignored
    flush()

    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    chosen = exact or [g for g in groups if "*" in g[0]]
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    for _, rs, d in chosen:
        rules.extend(rs)
        if d is not None:
            delay = d
    compiled = sorted(
        (_Rule(allow, pat, _compile(pat)) for allow, pat in rules),
        key=lambda r: (r.length, r.allow))
    return HostRules(
        rules=compiled,
        crawl_delay_ms=None if delay is None else int(delay * 1000))


_HOST_SEP = re.compile(r"^#\s*===\s*host:\s*(\S+)\s*$")


def parse_corpus(path: str, agent: str = UA_TOKEN) -> dict[str, HostRules]:
    """Parse a robots cache file: '# === host: <name>' separators, each
    section a verbatim robots.txt body for that host."""
    out: dict[str, HostRules] = {}
    host: str | None = None
    buf: list[str] = []
    with open(path) as f:
        for line in f:
            m = _HOST_SEP.match(line.strip())
            if m:
                if host is not None:
                    out[host] = parse_robots("\n".join(buf), agent)
                host, buf = m.group(1).lower(), []
            elif host is not None:
                buf.append(line.rstrip("\n"))
    if host is not None:
        out[host] = parse_robots("\n".join(buf), agent)
    return out


def default_corpus() -> str:
    """The checked-in robots cache (tests / default query rules)."""
    import os

    return os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "artifacts", "robots_corpus.txt")


_CORPUS_MEMO: dict[tuple[str, str], dict[str, HostRules]] = {}


def corpus_rules(path: str, agent: str = UA_TOKEN) -> dict[str, HostRules]:
    """Per-process memoized parse (workers pay the file read once)."""
    key = (path, agent)
    got = _CORPUS_MEMO.get(key)
    if got is None:
        got = _CORPUS_MEMO[key] = parse_corpus(path, agent)
    return got


def decide_batch(rules: dict[str, HostRules], hosts: np.ndarray,
                 paths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-distinct-host decisions: (allowed bool[n],
    crawl_delay_ms int64[n]; delay 0 = none declared).  Hosts absent
    from the corpus are allowed."""
    allowed = np.ones(len(hosts), dtype=bool)
    delay = np.zeros(len(hosts), dtype=np.int64)
    paths = paths.astype(str)
    for h in np.unique(hosts):
        hr = rules.get(str(h).lower())
        if hr is None:
            continue
        sel = hosts == h
        sub = paths[sel]
        if hr.crawl_delay_ms is not None:
            delay[sel] = hr.crawl_delay_ms
        verdict = np.ones(len(sub), dtype=bool)
        # rules pre-sorted (length asc, allow asc): last matching
        # write wins == longest-match, Allow on ties
        for r in hr.rules:
            if r.regex is None:
                m = np.char.startswith(sub, r.pattern)
            else:
                rx = r.regex
                m = np.fromiter((rx.match(p) is not None for p in sub),
                                dtype=bool, count=len(sub))
            verdict[m] = r.allow
        allowed[sel] = verdict
    return allowed, delay


class RobotsIndex:
    """T7 stateful stage: robots corpus compiled once per actor/task
    construction; batch decisions vectorized per distinct host."""

    def __init__(self, rules_path: str, agent: str = UA_TOKEN):
        self.rules = parse_corpus(rules_path, agent)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_numpy(zero_copy_only=False)
        paths = batch["path"].to_numpy(zero_copy_only=False)
        allowed, delay = decide_batch(self.rules, hosts, paths)
        return batch.append_column("allowed", pa.array(allowed)) \
            .append_column("crawl_delay_ms", pa.array(delay))


# ---------------------------------------------------------------------------
# DuckDB twin generation (rules cannot drift: SQL derives from the same
# parsed structures the engine matches with)

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _rule_pred(rule: _Rule, path_col: str) -> str:
    if rule.regex is None:
        return f"starts_with({path_col}, {_sql_quote(rule.pattern)})"
    anchored = rule.pattern.endswith("$")
    body = rule.pattern[:-1] if anchored else rule.pattern
    esc = body.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    like = esc.replace("*", "%") + ("" if anchored else "%")
    return f"{path_col} LIKE {_sql_quote(like)} ESCAPE '\\'"


def robots_sql_exprs(rules: dict[str, HostRules], host_col: str = "host",
                     path_col: str = "path") -> dict[str, str]:
    """{'allowed': CASE..., 'crawl_delay_ms': CASE...} mirroring
    :meth:`RobotsIndex.decide`: per host, rules ordered (length DESC,
    allow DESC) in a first-match-wins CASE == longest-match with Allow
    breaking ties."""
    host_arms, delay_arms = [], []
    for host in sorted(rules):
        hr = rules[host]
        if hr.rules:
            arms = " ".join(
                f"WHEN {_rule_pred(r, path_col)} THEN {'TRUE' if r.allow else 'FALSE'}"
                for r in sorted(hr.rules,
                                key=lambda r: (-r.length, not r.allow)))
            host_arms.append(
                f"WHEN {host_col} = {_sql_quote(host)} "
                f"THEN (CASE {arms} ELSE TRUE END)")
        if hr.crawl_delay_ms is not None:
            delay_arms.append(f"WHEN {host_col} = {_sql_quote(host)} "
                              f"THEN {hr.crawl_delay_ms}")
    allowed = ("CASE " + " ".join(host_arms) + " ELSE TRUE END"
               ) if host_arms else "TRUE"
    delay = ("CAST(CASE " + " ".join(delay_arms) + " ELSE 0 END AS BIGINT)"
             ) if delay_arms else "CAST(0 AS BIGINT)"
    return {"allowed": allowed, "crawl_delay_ms": delay}
