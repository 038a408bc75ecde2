"""Elasticsearch destination ack model (store/dests/elasticsearch.go).

The reference sends each message as one ITEM of a bulk request — index
name rendered from a template over msg fields, doc id = the message uid
(``sendOne``, elasticsearch.go:215-268) — batched by
``BulkActions(batch_size)`` (4000, conf/defaults.go:71) plus a flush
interval, and resolves delivery PER ITEM from the bulk response in the
``after`` callback: succeeded items ACK their uid, failed items NACK
theirs and the batch turns fatal (elasticsearch.go:169-203).

Without a live cluster the bulk RESPONSE is simulated
deterministically: an item fails exactly when its rendered index name
violates Elasticsearch's index-naming rules (the real per-item
``invalid_index_name_exception`` error path) — so the ack MODEL (bulk
grouping, per-item status extraction, uid bookkeeping) is what this
module exercises, not the transport. The same validity predicate is
SQL-expressible, which keeps the es sink oracle-gated.
"""

from __future__ import annotations

ES_BATCH_SIZE = 4000          # conf/defaults.go:71 elasticsearch batch_size

# ES index naming rules (public docs): lowercase only; must not contain
# \ / * ? " < > | space , # or ':'; must not start with - _ +; must not
# be '.' or '..'; must be ≤ 255 bytes.
_BAD_CHARS = set('\\/*?"<>| ,#:')


def valid_index_name(name: str) -> bool:
    if not name or name in (".", ".."):
        return False
    if len(name.encode("utf-8")) > 255:
        return False
    if name[0] in "-_+":
        return False
    if name != name.lower():
        return False
    return not any(c in _BAD_CHARS for c in name)


def bulk_responses(index_names: list[str], uids: list[str]):
    """Yield simulated bulk responses of ≤ ``ES_BATCH_SIZE`` items each,
    shaped like the ES bulk API answer the reference's After callback
    consumes: ``{"errors": bool, "items": [{"index": {"_index", "_id",
    "status", ["error"]}}]}``."""
    for start in range(0, len(uids), ES_BATCH_SIZE):
        items = []
        errors = False
        for name, uid in zip(index_names[start:start + ES_BATCH_SIZE],
                             uids[start:start + ES_BATCH_SIZE]):
            if valid_index_name(name):
                items.append({"index": {"_index": name, "_id": uid,
                                        "status": 201}})
            else:
                errors = True
                items.append({"index": {
                    "_index": name, "_id": uid, "status": 400,
                    "error": {"type": "invalid_index_name_exception",
                              "reason": f"Invalid index name [{name}]"}}})
        yield {"errors": errors, "items": items}


def after(response: dict) -> tuple[list[str], list[str]]:
    """The ElasticDestination.after callback (elasticsearch.go:169-203):
    split one bulk response into (acked_uids, nacked_uids) by per-item
    status — success (2xx) → ACK, failure → NACK."""
    acked: list[str] = []
    nacked: list[str] = []
    for item in response["items"]:
        body = item["index"]
        if 200 <= body["status"] < 300 and "error" not in body:
            acked.append(body["_id"])
        else:
            nacked.append(body["_id"])
    return acked, nacked


def bulk_ack_statuses(index_names: list[str],
                      uids: list[str]) -> dict[str, bool]:
    """uid → delivered? over the full simulated bulk exchange (every
    batch sent, every response folded through ``after``)."""
    out: dict[str, bool] = {}
    for resp in bulk_responses(index_names, uids):
        acked, nacked = after(resp)
        for u in acked:
            out[u] = True
        for u in nacked:
            out[u] = False
    return out
