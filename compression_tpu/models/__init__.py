"""Model zoo: research codecs re-built TPU-native.

Families (reference parity, SURVEY.md §2.3):
  bls2017   — factorized prior (Ballé et al. 2017)
  bmshj2018 — scale hyperprior (Ballé et al. 2018)
  mbt2018   — mean-scale hyperprior (Minnen et al. 2018)
  ms2020    — channel-wise autoregressive, CHARM (Minnen & Singh 2020)
  hific     — generative codec (Mentzer et al. 2020)
  toy_sources — low-dimensional source experiments
"""
