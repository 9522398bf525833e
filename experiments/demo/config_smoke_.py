# demo: tiny synthetic-friendly BIG-C config (for smoke tests / CI).
model_config = dict(
    num_enti_cats   = 36,
    num_pred_cats   = 133,
    dim_ffn         = 64,
    dim_enti        = 64,
    dim_pred        = 64,
    dim_att         = 64,
    dim_feat        = 64,
    dim_clsme       = 300,
    dim_i3d         = 16,
    enco_pool_len   = 4,
    n_enco_layers   = 1,
    n_deco_layers   = 2,
    n_att_head      = 4,
    num_querys      = 48,
    neg_weight      = 0.1,
    positive_vIoU_th= 0.5,
    EntiNameEmb_path= None,
    bias_matrix_path= None,
    cost_coeff_dict = dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict = dict(classification=1.0, adj_matrix=30.0),
)
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="test")
train_config = dict(
    batch_size          = 4,
    total_epoch         = 2,
    initial_lr          = 1e-4,
    lr_decay            = 0.2,
    epoch_lr_milestones = [1],
)
inference_config = dict(topk=10)
