# demo: tiny synthetic-friendly VidOR configs (cls + grounding smoke tests).
model_config = dict(
    num_enti_cats   = 81,
    num_pred_cats   = 51,
    dim_ffn         = 64,
    dim_enti        = 64,
    dim_pred        = 64,
    dim_att         = 64,
    dim_feat        = 64,
    dim_clsme       = 300,
    enco_pool_len   = 4,
    n_enco_layers   = 1,
    n_deco_layers   = 2,
    n_att_head      = 4,
    num_querys      = 48,
    neg_weight      = 0.1,
    positive_vIoU_th= 0.5,
    use_clsme       = True,
    rt_triplets_topk= -1,
    EntiNameEmb_path= None,
    bias_matrix_path= None,
    cost_coeff_dict = dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict = dict(classification=1.0, adj_matrix=30.0),
)
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(
    batch_size          = 2,
    total_epoch         = 1,
    initial_lr          = 5e-5,
    lr_decay            = 0.2,
    epoch_lr_milestones = [1],
)
inference_config = dict(topk=3)
