from cnrma_tpu.data.scannet import ScanNetDataset
from cnrma_tpu.data.arkit import ARKitDataset
from cnrma_tpu.data.points_dataset import MiddlePointsDataset
from cnrma_tpu.data.loader import SceneLoader, collate_scenes
