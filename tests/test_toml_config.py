"""TOML pipeline-config surface (skewer.example.toml semantics with
Python as the embedded hook language)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from skewer_ray.toml_config import config_from_toml, go_template_to_py

EXAMPLE = '''
# two listeners with different formats + hooks
[[syslog]]
  port = 1514
  format = "rfc5424"
  protocol = "tcp"
  topic_tmpl = "logs-{{.Appname}}"
  partition_key_tmpl = "pk-{{.Hostname}}"
  filter_func = """
def FilterMessages(msg):
    if msg.Severity == 7:
        return FILTER.DROPPED
    msg.Msgid = msg.Msgid.upper()
    return FILTER.PASS
"""

[[syslog]]
  port = 2514
  format = "Zed"
  protocol = "tcp"
  topic_function = """
def Topic(msg):
    return "zed-" + msg.Appname
"""

[[parser]]
  name = "Zed"
  func = """
def Zed(raw):
    if not raw.startswith("ZED|"):
        return None
    m = NewEmptySyslogMessage()
    m.Appname = "zedapp"
    m.Facility = 16
    m.Severity = 5
    m.Message = raw.split("|", 1)[1]
    return m
"""

[kafka]
  brokers = ["k1", "k2"]
  compression = "snappy"

[file_destination]
  filename = "{{.Appname}}-{{.Hostname}}"
  format = "file"

[elasticsearch_destination]
  index_name_template = "logs-{{.Msgid}}"
  format = "json"
'''


def test_go_template_mapping():
    assert go_template_to_py("syslog-{{.Appname}}") == "syslog-{appname}"
    assert go_template_to_py("{{ .Hostname }}/{{.Msgid}}") == \
        "{hostname}/{msgid}"
    assert go_template_to_py("x-{{.TimeReported}}") == "x-{time_reported}"


def test_config_from_toml_structure():
    cfg = config_from_toml(EXAMPLE)
    assert set(cfg.decoder_for_family) == {0, 1}
    assert cfg.decoder_for_family[0].format == "rfc5424"
    assert cfg.decoder_for_family[1].format == "custom"
    assert cfg.decoder_for_family[1].custom_parser == "Zed"
    assert [s.name for s in cfg.sinks] == ["kafka", "file", "es"]
    assert cfg.sinks[1].filename_tmpl == "{appname}-{hostname}"
    assert cfg.sinks[2].kind == "es"
    assert cfg.sinks[2].filename_tmpl == "logs-{msgid}"
    # two sections → per-ConfId hook dict
    assert isinstance(cfg.hooks, dict) and 0 in cfg.hooks and 1 in cfg.hooks


def test_toml_hooks_through_router(ray_session):
    """The compiled Python hooks behave like the reference contract:
    template topics, FILTER enum results, PASS mutation write-back, and
    the [[parser]] custom format — end to end through the real stages."""
    from skewer_ray.stages import ParseStage, RouterStage

    cfg = config_from_toml(EXAMPLE)
    rows = []
    # conv index % 12 = family → section: conv-..00 → section 0 (5424),
    # conv-..01 → section 1 (Zed custom parser)
    for t in range(4):
        sev = 7 if t == 3 else 2
        rows.append(("conv-00000000", t,
                     f"<{32 + sev}>1 2026-01-15T05:10:02Z h app1 - id{t} - m{t}"))
        rows.append(("conv-00000001", t, f"ZED|payload {t}"))
    rows.append(("conv-00000001", 9, "not zed"))
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([""] * len(rows)),
        "text": pa.array([r[2] for r in rows]),
        "tool": pa.array([""] * len(rows)),
        "ts": pa.array([1_700_000_000_000_000] * len(rows),
                       pa.timestamp("us")),
    })
    parsed = ParseStage(decoder_for_family=cfg.decoder_for_family,
                        custom_parsers=cfg.custom_parsers)(tbl)
    routed = RouterStage(hooks=cfg.hooks)(parsed)

    by_key = {(c, t): i for i, (c, t) in enumerate(
        zip(routed["conv_id"].to_pylist(),
            pc.cast(routed["turn_idx"], pa.int64()).to_pylist()))}
    topics = routed["topic"].to_pylist()
    status = routed["filter_status"].to_pylist()
    msgids = routed["msgid"].to_pylist()
    apps = routed["appname"].to_pylist()

    i = by_key[("conv-00000000", 0)]
    assert topics[i] == "logs-app1"
    assert status[i] == "passing"
    assert msgids[i] == "ID0"            # PASS mutation write-back
    i = by_key[("conv-00000000", 3)]
    assert status[i] == "dropped"        # severity 7 → FILTER.DROPPED
    i = by_key[("conv-00000001", 0)]
    assert apps[i] == "zedapp"           # [[parser]] custom format
    assert topics[i] == "zed-zedapp"     # topic_function
    assert routed["facility"].to_pylist()[i] == 16
    i = by_key[("conv-00000001", 9)]
    assert not routed["parse_ok"].to_pylist()[i]  # parser returned None


def test_toml_config_runs_fused_pipeline(ray_session):
    """config_from_toml output drives the full fused fan-out path
    (hooks/parsers survive cloudpickle to Ray workers)."""
    import ray.data as rd
    from skewer_ray.pipelines.flagship import build_fanout

    cfg = config_from_toml(EXAMPLE)
    tbl = pa.table({
        "conv_id": pa.array(["conv-00000001"] * 50),
        "turn_idx": pa.array(range(50), pa.int32()),
        "role": pa.array([""] * 50),
        "text": pa.array([f"ZED|line {i}" for i in range(50)]),
        "tool": pa.array([""] * 50),
        "ts": pa.array([1_700_000_000_000_000] * 50, pa.timestamp("us")),
    })
    out = build_fanout(rd.from_arrow(tbl), cfg).to_pandas()
    passing = out[(out.sink == "kafka") & (out.status == "passing")]
    assert len(passing) == 50
    assert (passing.topic == "zed-zedapp").all()
    froutes = out[(out.sink == "file") & (out.status == "passing")].route
    assert set(froutes) == {"zedapp-"}  # {appname}-{hostname}, empty host
