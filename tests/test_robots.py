"""robots.txt REP core (functions/robots.py): section selection,
longest-match, Allow tie-break, and the vectorized mask."""

import pyarrow as pa

from htmlreader_ray.functions.robots import (allowed_mask, parse_robots,
                                             RobotsFilter)


def test_parse_basic_section():
    txt = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert parse_robots(txt) == [("/a", False), ("/a/b", True)]


def test_parse_other_agent_ignored():
    txt = "User-agent: googlebot\nDisallow: /\n"
    assert parse_robots(txt) == []
    assert parse_robots(txt, agent="googlebot") == [("/", False)]


def test_parse_consecutive_agents_share_group():
    # RFC 9309 2.2.1: adjacent user-agent lines start ONE group
    txt = ("User-agent: googlebot\nUser-agent: *\nDisallow: /x\n"
           "User-agent: bingbot\nDisallow: /y\n")
    assert parse_robots(txt) == [("/x", False)]


def test_parse_comments_case_empty_values():
    txt = ("# header comment\n"
           "USER-AGENT: *\n"
           "disallow: /p   # trailing comment\n"
           "Disallow:\n"          # empty -> matches nothing, dropped
           "Allow:\n")
    assert parse_robots(txt) == [("/p", False)]


def _mask(rules, hosts, paths):
    return allowed_mask(pa.array(hosts), pa.array(paths),
                        {"h": rules}).to_pylist()


def test_longest_match_wins():
    rules = [("/a", False), ("/a/b", True), ("/a/b/c", False)]
    assert _mask(rules, ["h"] * 4,
                 ["/a/x", "/a/b", "/a/b/cd", "/z"]) == \
        [False, True, False, True]


def test_allow_wins_length_tie():
    rules = [("/a", False), ("/a", True)]
    assert _mask(rules, ["h"], ["/a/x"]) == [True]


def test_no_rules_or_other_host_allowed():
    assert allowed_mask(pa.array(["other"]), pa.array(["/a"]),
                        {"h": [("/a", False)]}).to_pylist() == [True]


def test_robots_filter_stage(ray_session):
    import ray
    ref = ray.put({"h": [("/a", False)]})
    st = RobotsFilter(ref)
    out = st(pa.table({"host": ["h", "h", "g"],
                       "path": ["/a/1", "/b", "/a/1"]}))
    assert out.column("allowed").to_pylist() == [0, 1, 1]
    assert out.column("allowed").type == pa.int64()
