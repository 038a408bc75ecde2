from .flagship import (build_parsed, build_routed, build_fanout,
                       run_flagship, sink_counts)

__all__ = ["build_parsed", "build_routed", "build_fanout", "run_flagship",
           "sink_counts"]
