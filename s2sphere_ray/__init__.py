"""s2sphere_ray — a Ray-Data-native S2 spatial-join + tiling engine.

Built from scratch on the S2 geometry semantics of the reference library
(`sidewalklabs/s2sphere`; see SURVEY.md) re-expressed as vectorized Arrow
batch kernels (`cells`), scalar region algorithms for actor-pool stages
(`geometry`), and Ray Data operator stages (`stages`, `functions`,
`pipelines`).
"""

__version__ = "0.1.0"
