"""ARKitScenes joint finetune / eval config (stage 3).

Keeps the knob surface of the reference config
``projects/configs/mvsdetection/ray_marching_arkit.py`` (class list, voxel
grids, frame counts, NeuS threshold, optimizer/LR schedule, model sub-dicts)
so checkpoints and results remain comparable; adds the TPU-specific static
capacities.
"""

class_names = ['cabinet', 'refrigerator', 'shelf', 'stove', 'bed', 'sink',
               'washer', 'toilet', 'bathtub', 'oven', 'dishwasher',
               'fireplace', 'stool', 'chair', 'table', 'tv_monitor', 'sofa']
classes = len(class_names)

PIXEL_MEAN = [103.53, 116.28, 123.675]
PIXEL_STD = [1.0, 1.0, 1.0]
VOXEL_SIZE = 0.04
VOXEL_SIZE_FCAF3D = 0.01
N_SCALES = 3
VOXEL_DIM_TRAIN = [192, 192, 80]
VOXEL_DIM_TEST = [192, 192, 80]
NUM_FRAMES_TRAIN = 40
NUM_FRAMES_TEST = 40
USE_BATCHNORM_TRAIN = True
USE_BATCHNORM_TEST = True
LOSS_WEIGHT_RECON = 0.5
LOSS_WEIGHT_DETECTION = 1.0

RAY_MARCHING_TYPE = 'neus'
NEUS_THRESHOLD = 0.05
DEPTH_POINTS = None

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[27, 36])

work_dir = './work_dirs/ray_marching_arkit'
save_path = work_dir + '/results'
load_from = None
resume_from = None

total_epochs = 40
checkpoint_config = dict(interval=10)
# mid-training val evaluation every `interval` epochs (reference
# `evaluation = dict(interval=3000, ...)`, ray_marching_scannet.py:47)
evaluation = dict(interval=10, metric='mAP')
log_config = dict(interval=10)
seed = 0

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type='AtlasARKitDataset',
        data_root='./data/arkit',
        ann_file='./data/arkit/arkit_infos_train.pkl',
        classes=class_names,
        test_mode=False,
        num_frames=NUM_FRAMES_TRAIN,
        voxel_size=VOXEL_SIZE,
        select_type='random',
        voxel_dim=VOXEL_DIM_TRAIN,
        space_mode='middle'),
    val=dict(
        type='AtlasARKitDataset',
        data_root='./data/arkit',
        ann_file='./data/arkit/arkit_infos_val.pkl',
        classes=class_names,
        test_mode=True,
        num_frames=NUM_FRAMES_TEST,
        voxel_size=VOXEL_SIZE,
        select_type='random',
        voxel_dim=VOXEL_DIM_TEST,
        space_mode='middle'),
    test=dict(
        type='AtlasARKitDataset',
        data_root='./data/arkit',
        ann_file='./data/arkit/arkit_infos_val.pkl',
        classes=class_names,
        test_mode=True,
        num_frames=NUM_FRAMES_TEST,
        voxel_size=VOXEL_SIZE,
        select_type='random',
        voxel_dim=VOXEL_DIM_TEST,
        space_mode='middle'))

model = dict(
    type='RayMarching',
    pixel_mean=PIXEL_MEAN,
    pixel_std=PIXEL_STD,
    voxel_size=VOXEL_SIZE,
    n_scales=N_SCALES,
    voxel_dim_train=VOXEL_DIM_TRAIN,
    voxel_dim_test=VOXEL_DIM_TEST,
    origin=[0, 0, 0],
    backbone2d_stride=4,
    # auto-loaded Caffe2 R-50 weights (reference fpn.py:142-144); set to a
    # real path before training from stage 1
    backbone2d=dict(pretrained='./data/R-50.pth'),
    loss_weight_detection=LOSS_WEIGHT_DETECTION,
    loss_weight_recon=LOSS_WEIGHT_RECON,
    voxel_size_fcaf3d=VOXEL_SIZE_FCAF3D,
    use_batchnorm_train=USE_BATCHNORM_TRAIN,
    use_batchnorm_test=USE_BATCHNORM_TEST,
    ray_marching_type=RAY_MARCHING_TYPE,
    neus_threshold=NEUS_THRESHOLD,
    depth_points=DEPTH_POINTS,
    max_points=500000,
    # 98304 keeps 100% of per-view weight mass (32768 clipped up
    # to 36% on interior views — tools/raycap_probe.py)
    rays_per_view_cap=98304,
    bp_accum_dtype='bfloat16',  # round-4 TPU A/B win (doc/performance.md)
    ray_samples=300,
    # static sparse-tensor capacities (TPU fixed shapes)
    capacities=dict(voxelize=409600, stride2=262144, stride4=131072,
                    levels=[32768, 12288, 4096, 2048],
                    neck=[262144, 65536, 16384]),
    feature_2d=dict(output_dim=32, output_stride=4, norm='BN'),
    backbone_3d=dict(
        type='AtlasBackbone3D',
        channels=[32, 64, 128, 256],
        layers_down=[1, 2, 3, 4],
        layers_up=[3, 2, 1],
        norm='BN'),
    tsdf_head=dict(
        type='AtlasTSDFHead',
        input_channels=[32, 64, 128],
        n_scales=3,
        voxel_size=VOXEL_SIZE,
        label_smoothing=1.05,
        sparse_threshold=[0.99, 0.99, 0.99]),
    detection_backbone=dict(type='FCAF3DBackbone', in_channels=32,
                            depth=34),
    detection_head=dict(
        type='FCAF3DHead',
        in_channels=(64, 128, 256, 512),
        out_channels=128,
        pts_threshold=200000,
        n_classes=classes,
        n_reg_outs=8,
        voxel_size=VOXEL_SIZE_FCAF3D,
        assigner=dict(type='FCAF3DAssigner', limit=27, topk=18,
                      n_scales=4),
        loss_bbox=dict(type='IoU3DLoss', loss_weight=1.0, with_yaw=True),
        test_cfg=dict(nms_pre=1000, iou_thr=0.5, score_thr=0.01)),
    use_feature_transform=True,
    feature_transform=dict(
        flip_ratio_horizontal=0.5,
        flip_ratio_vertical=0.5,
        rot_range=[-0.087266, 0.087266],
        scale_ratio_range=[0.9, 1.1],
        translation_std=[0.1, 0.1, 0.1]))
