"""Command-line entry points (run as `python -m gaudi_tpu.cli.<name>`):

- train_edm: unconditional diffusion training (reference train_edm.py)
- train_predictor: property predictor training (reference
  cond_prediction/train_cond_predictor.py)
- eval_validity: unconditional sampling + stability/validity report
  (reference eval_validity.py)
- generate: classifier-guided design (reference generation_guidance.py)
"""
