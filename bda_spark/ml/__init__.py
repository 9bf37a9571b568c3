"""pyspark.ml surface (SURVEY.md §2.10 D3-D7).

- persistence: pointer-file model store (save/load/current) replacing the
  reference's per-batch disk reload
- tournament: LR/RF/GBT model tournament with RMSE/MAE/R2 evaluation and
  the old-vs-new deploy gate
"""
