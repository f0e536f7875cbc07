"""REMI — ComiRec-SA + Interest-aware Hard Negative mining (IHN) + Routing
Regularization (RR).

Reference ``code/REC/model/IDNet/remi.py``: identical multi-interest trunk
as ComiRec (remi.py:40-100); adds the RR loss over routing-weight variances
(remi.py:156-199) and the IHN importance-sampled NCE (remi.py:201-278). Both
are implemented in :mod:`mhrec_tpu.models.idnet.comirec` (the RR statistics
telescope into cumulative sums, see ``routing_regularization``); REMI is the
ComiRec module with ``lambda_rr`` / ``beta_ihn`` active.
"""

from __future__ import annotations

from mhrec_tpu.models.idnet.comirec import ComiRec

REMI = ComiRec  # same module; REMI-ness lives in the loss hyperparameters


def remi_from_config(config, dataload) -> ComiRec:
    dim = config["hstu_embedding_size"]
    hidden = config.get("interest_hidden", 0) or int(
        dim * config.get("interest_hidden_ratio", 0.5)
    )
    return ComiRec(
        item_num=dataload.item_num,
        item_embedding_size=config["item_embedding_size"],
        hstu_embedding_size=dim,
        max_seq_length=config["MAX_ITEM_LIST_LENGTH"],
        pred_len=config["pred_len"],
        n_layers=config["n_layers"],
        n_heads=config["n_heads"],
        hidden_act=config["hidden_act"] or "silu",
        hidden_dropout_prob=config["hidden_dropout_prob"] or 0.1,
        num_interest=config.get("interest_num", config.get("num_interest", 4)),
        interest_hidden=hidden,
        attention_net_bias=config.get("attention_net_bias", True),
        skip_hstu=config.get("skip_hstu", False),
        use_input_dropout=config.get("input_dropout", False),
        medusa_lambda=config["medusa_lambda"],
        nce_thres=config["nce_thres"] or 0.99,
        fix_temp=bool(config["fix_temp"]),
        eval_pred_len=config["eval_pred_len"],
        lambda_rr=float(config.get("lambda_rr", 0.0) or 0.0),
        beta_ihn=float(config.get("beta_ihn", 0.0) or 0.0),
    )
