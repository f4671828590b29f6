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


def test_robots_joined_parity_with_broadcast(ray_session):
    """The web-scale host-join path (rules as a Dataset, packed
    one-row-per-host, left-joined on host) must decide bit-identically
    to the ray.put broadcast path — including hosts with no rules
    (allowed) and the Allow length-tie."""
    import ray
    import ray.data as rd
    from htmlreader_ray.functions.robots import robots_filter_joined

    rules = {
        "a.com": [("/x/", False), ("/x/ok", True)],
        "b.com": [("/", False)],
        "c.com": [("/p", True), ("/p", False)],   # tie -> Allow
    }
    urls = pa.table({
        "host": ["a.com", "a.com", "a.com", "b.com", "d.com",
                 "c.com", "c.com"],
        "path": ["/x/no", "/x/ok/page", "/y", "/any", "/free",
                 "/p/1", "/q"],
        "uid": pa.array(range(7), pa.int64()),
    })
    ref = ray.put(rules)
    bc = rd.from_arrow(urls).map_batches(
        RobotsFilter(ref), batch_format="pyarrow").to_pandas() \
        .sort_values("uid").reset_index(drop=True)
    rule_rows = pa.table({
        "host": [h for h, rs in rules.items() for _ in rs],
        "prefix": [p for rs in rules.values() for p, _ in rs],
        "allow": [a for rs in rules.values() for _, a in rs],
    })
    jn = robots_filter_joined(
        rd.from_arrow(urls), rd.from_arrow(rule_rows)).to_pandas() \
        .sort_values("uid").reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(bc[["uid", "allowed"]], jn[["uid", "allowed"]])
    assert jn.allowed.tolist() == [0, 1, 1, 0, 1, 1, 1]
