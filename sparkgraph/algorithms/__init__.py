from sparkgraph.algorithms.pagerank import pagerank, top_k  # noqa: F401
from sparkgraph.algorithms.sssp import sssp  # noqa: F401
from sparkgraph.algorithms.components import connected_components  # noqa: F401
from sparkgraph.algorithms.lpa import label_propagation  # noqa: F401
from sparkgraph.algorithms.triangles import triangle_count  # noqa: F401
from sparkgraph.algorithms.scc import strongly_connected_components  # noqa: F401
from sparkgraph.algorithms.walks import random_walks, skipgram_pairs  # noqa: F401
from sparkgraph.algorithms.closeness import (  # noqa: F401
    harmonic_closeness_sampled,
    landmark_distance_estimate,
    landmark_distances,
)
from sparkgraph.algorithms.katz import katz_centrality  # noqa: F401
