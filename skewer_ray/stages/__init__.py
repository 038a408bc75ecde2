from .parse import ParseStage, family_array
from .enrich import EnrichStage
from .route import RouterStage
from .fanout import FanoutEncodeStage

__all__ = ["ParseStage", "EnrichStage", "RouterStage", "FanoutEncodeStage",
           "family_array"]
