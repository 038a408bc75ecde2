"""Syslog constants mirrored from the reference.

Facility/severity enums and names: /root/reference/model/types.go:18-81.
Topic validation rules: /root/reference/javascript/vm.go:497-535.
"""

from __future__ import annotations

FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "clock", "authpriv", "ftp", "ntp", "logaudit", "logalert",
    "cron", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7",
]
SEVERITIES = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]

R_FACILITIES = {name: i for i, name in enumerate(FACILITIES)}
R_SEVERITIES = {name: i for i, name in enumerate(SEVERITIES)}

F_USER = 1
S_INFO = 6


def facility_from_string(name: str) -> int:
    """model.FacilityFromString — unknown names → user(1)
    (model/types.go:189-194)."""
    return R_FACILITIES.get(name, F_USER)


def severity_from_string(name: str) -> int:
    """model.SeverityFromString — unknown → info(6) (model/types.go:199-206)."""
    return R_SEVERITIES.get(name, S_INFO)


_TOPIC_OK = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-"
)


def topic_name_is_valid(name: str) -> bool:
    """javascript/vm.go:497-535 — [a-zA-Z0-9._-]+, 1..249 chars."""
    if not name or len(name) > 249:
        return False
    return all(c in _TOPIC_OK for c in name)


DEFAULT_TOPIC = "default-topic"

# filter results — javascript/vm.go:45-60
FILTER_PASS = 0
FILTER_DROPPED = 1
FILTER_REJECTED = 2
FILTER_ERROR = 3

FILTER_NAMES = {
    FILTER_PASS: "passing",
    FILTER_DROPPED: "dropped",
    FILTER_REJECTED: "rejected",
    FILTER_ERROR: "error",
}
