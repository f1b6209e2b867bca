"""nuScenes category helpers (semantics of utils/nuscenes.py:55-70)."""


def select_categories(cat):
    """Map a coarse category name to nuScenes category prefixes."""
    assert cat in ('person', 'all', 'car', 'cyclist')
    if cat == 'person':
        return ['human.pedestrian']
    if cat == 'all':
        return ['human.pedestrian', 'vehicle.bicycle', 'vehicle.motorcycle']
    if cat == 'cyclist':
        return ['vehicle.bicycle']
    return ['vehicle.car']
