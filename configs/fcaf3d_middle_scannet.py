"""Stage-2.2: pretrain the FCAF3D detector on dumped ray-marched points.

In-framework replacement for the reference's external-repo configs
(``fcaf3d/fcaf3d_middle_scannet.py``: 35-dim points, 500k sample,
RepeatDataset x10, 12 epochs, AdamW 1e-3/1e-4, step [8, 11]).
Input points come from a ``scannet_middle.py`` dump run
(``tools/test.py --middle-save-path``).
"""

class_names = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
               'bookshelf', 'picture', 'counter', 'desk', 'curtain',
               'refrigerator', 'showercurtain', 'toilet', 'sink', 'bathtub',
               'garbagebin']
classes = len(class_names)

VOXEL_SIZE_FCAF3D = 0.01

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[8, 11])

work_dir = './work_dirs/fcaf3d_middle_scannet'
save_path = work_dir + '/results'
load_from = None
resume_from = None

total_epochs = 12
checkpoint_config = dict(interval=1)
# mid-training val evaluation every `interval` epochs (reference
# `evaluation = dict(interval=3000, ...)`, ray_marching_scannet.py:47)
evaluation = dict(interval=10)
log_config = dict(interval=10)
seed = 0

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type='MiddlePointsDataset',
        data_root='./data/scannet',
        ann_file='./data/scannet/scannet_infos_train.pkl',
        points_dir='./work_dirs/scannet_middle/middle_points',
        classes=class_names,
        test_mode=False,
        num_points=500000,
        load_dim=35,
        with_yaw=False,
        repeat=10),
    test=dict(
        type='MiddlePointsDataset',
        data_root='./data/scannet',
        ann_file='./data/scannet/scannet_infos_val.pkl',
        points_dir='./work_dirs/scannet_middle/middle_points',
        classes=class_names,
        test_mode=True,
        num_points=500000,
        load_dim=35,
        with_yaw=False))

model = dict(
    type='FCAF3DOnly',
    n_classes=classes,
    n_reg_outs=6,
    with_yaw=False,
    voxel_size=VOXEL_SIZE_FCAF3D,
    pts_threshold=200000,
    assigner=dict(limit=27, topk=18),
    nms_pre=1000,
    capacities=dict(voxelize=409600, stride2=262144, stride4=131072,
                    levels=[32768, 12288, 4096, 2048],
                    neck=[262144, 65536, 16384]),
    use_feature_transform=True,
    feature_transform=dict(
        flip_ratio_horizontal=0.5,
        flip_ratio_vertical=0.5,
        rot_range=[-0.087266, 0.087266],
        scale_ratio_range=[0.9, 1.1],
        translation_std=[0.1, 0.1, 0.1]))
