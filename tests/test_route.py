"""Routing/filter hook tests (javascript/vm.go semantics +
store/forwarder.go:126-219) and the topic validation ladder."""

import pyarrow as pa

from skewer_ray.config import (HookSet, default_config, default_filter,
                               default_topic_fn, render_template)
from skewer_ray.constants import (DEFAULT_TOPIC, FILTER_DROPPED, FILTER_PASS,
                                  FILTER_REJECTED, topic_name_is_valid)
from skewer_ray.stages import RouterStage


def test_topic_validation():
    assert topic_name_is_valid("syslog-app1")
    assert topic_name_is_valid("a.B_c-9")
    assert not topic_name_is_valid("")
    assert not topic_name_is_valid("x" * 250)
    assert not topic_name_is_valid("has space")
    assert not topic_name_is_valid("sl/ash")


def test_hookset_topic_ladder():
    h = HookSet(topic_fn=lambda r: "")
    assert h.topic({}) == DEFAULT_TOPIC                  # empty → default
    h = HookSet(topic_fn=lambda r: "bad topic!")
    assert h.topic({}) == DEFAULT_TOPIC                  # invalid → default
    h = HookSet(topic_tmpl="syslog-{appname}")
    assert h.topic({"appname": "x"}) == "syslog-x"       # template fallback
    h = HookSet(topic_fn=lambda r: 1 / 0)
    assert h.topic({}) == DEFAULT_TOPIC                  # hook error → default


def test_render_template_missing_keys():
    assert render_template("pk-{hostname}", {}) == "pk-"


def test_default_filter():
    assert default_filter({"severity": 7, "appname": "a", "msgid": ""})[0] == FILTER_DROPPED
    assert default_filter({"severity": 1, "appname": "reject-me", "msgid": ""})[0] == FILTER_REJECTED
    code, mut = default_filter({"severity": 1, "appname": "a", "msgid": "id07"})
    assert code == FILTER_PASS and mut == {"msgid": "ID07"}


def _record_batch(**overrides):
    base = {
        "conv_id": ["conv-00000000"], "turn_idx": [0], "sub_idx": [0],
        "uid": ["conv-00000000:0:0"], "role": ["user"], "tool": [""],
        "parse_ok": [True], "priority": [34], "facility": [4],
        "severity": [2], "version": [1], "time_reported": [0],
        "time_generated": [0], "hostname": ["h"], "appname": ["a"],
        "procid": ["p"], "msgid": ["id01"], "structured": [""],
        "message": ["m"], "properties": ["{}"],
    }
    base.update(overrides)
    n = len(base["conv_id"])
    cols = {}
    for k, v in base.items():
        if k in ("turn_idx", "sub_idx", "priority", "facility", "severity",
                 "version"):
            cols[k] = pa.array(v, pa.int32())
        elif k in ("time_reported", "time_generated"):
            cols[k] = pa.array(v, pa.int64())
        elif k == "parse_ok":
            cols[k] = pa.array(v, pa.bool_())
        else:
            cols[k] = pa.array(v, pa.string())
    assert all(len(v) == n for v in base.values())
    return pa.table(cols)


def test_router_stage_pass_mutation():
    cfg = default_config()
    out = RouterStage(cfg.hooks)(_record_batch())
    assert out["topic"][0].as_py() == "syslog-a"
    assert out["partition_key"][0].as_py() == "pk-h"
    assert out["filter_status"][0].as_py() == "passing"
    assert out["msgid"][0].as_py() == "ID01"  # mutation written back


def test_router_stage_drop_reject_parse_error():
    cfg = default_config()
    b = _record_batch(
        conv_id=["conv-00000000"] * 3, turn_idx=[0, 1, 2], sub_idx=[0] * 3,
        uid=["u0", "u1", "u2"], role=["user"] * 3, tool=[""] * 3,
        parse_ok=[True, True, False], priority=[39, 34, 0],
        facility=[4, 4, 0], severity=[7, 2, 0], version=[1, 1, 0],
        time_reported=[0] * 3, time_generated=[0] * 3,
        hostname=["h"] * 3, appname=["a", "reject-me", ""],
        procid=[""] * 3, msgid=["id01"] * 3, structured=[""] * 3,
        message=["m"] * 3, properties=["{}"] * 3)
    out = RouterStage(cfg.hooks)(b)
    assert out["filter_status"].to_pylist() == ["dropped", "rejected",
                                                "parse_error"]


def test_router_filter_error_is_permerror():
    def bad_filter(rec):
        raise RuntimeError("boom")
    out = RouterStage(HookSet(filter_fn=bad_filter))(_record_batch())
    assert out["filter_status"][0].as_py() == "error"


def test_partition_number_hook():
    h = HookSet(partition_number_fn=lambda r: r["severity"] + 10)
    out = RouterStage(h)(_record_batch())
    assert out["partition_number"][0].as_py() == 12


def test_per_conf_hook_selection():
    """Per-ConfId hook envs (store/forwarder.go:133-156): different
    source families route through different topic hooks."""
    import pyarrow as pa
    from skewer_ray.config import HookSet, default_config
    from skewer_ray.stages import ParseStage, RouterStage
    from skewer_ray.gen import generate_table

    cfg = default_config()
    tbl = generate_table(600)  # conv families 0..N
    parsed = ParseStage(decoder_for_family=cfg.decoder_for_family,
                        custom_parsers=cfg.custom_parsers)(tbl)
    hooks = {
        None: HookSet(topic_tmpl="default-{appname}"),
        0: HookSet(topic_fn=lambda r: "family-zero"),
        2: HookSet(topic_fn=lambda r: "family-two"),
    }
    out = RouterStage(hooks=hooks)(parsed)
    from skewer_ray.stages.parse import family_array
    fams = family_array(out["conv_id"])
    topics = out["topic"].to_pylist()
    ok = out["parse_ok"].to_pylist()
    for f, t, o in zip(fams, topics, ok):
        if not o:
            continue
        if f == 0:
            assert t == "family-zero"
        elif f == 2:
            assert t == "family-two"
        else:
            assert t.startswith("default-") or t == "default-topic"


def test_vectorized_hooks_match_loop_path():
    """The all-Arrow fast path and the per-row loop must produce
    identical route columns over a real parsed batch (all 12 families,
    parse errors, drops, rejects, mutations)."""
    import dataclasses
    from skewer_ray.config import default_config
    from skewer_ray.gen import generate_table
    from skewer_ray.stages import ParseStage

    cfg = default_config()
    tbl = generate_table(3000)
    parsed = ParseStage(decoder_for_family=cfg.decoder_for_family,
                        custom_parsers=cfg.custom_parsers)(tbl)
    assert cfg.hooks.vectorized
    fast = RouterStage(hooks=cfg.hooks)(parsed)
    loop_hooks = dataclasses.replace(
        cfg.hooks, topic_batch=None, partition_key_batch=None,
        filter_batch=None)
    assert not loop_hooks.vectorized
    slow = RouterStage(hooks=loop_hooks)(parsed)
    for col in ("topic", "partition_key", "partition_number",
                "filter_result", "filter_status", "msgid"):
        assert fast[col].to_pylist() == slow[col].to_pylist(), col
