#!/usr/bin/env python3
"""Deterministic reference-shaped bronze fixtures (FIXTURES.md §1-§4).

Writes JSONL batch-envelope docs to src/test/resources/mars/bronze/.
Shapes mirror the reference's own test fixtures; the gap scenario
(FIXTURES.md §7) is built in: each rover's manifest declares sols its
photo batches don't fully cover.
"""
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/mars/bronze")
os.makedirs(OUT, exist_ok=True)

T_MANIFESTS = "2025-09-15T10:00:00"
T_COORDS = "2025-09-15T11:00:00"
T_PHOTOS = "2025-09-15T12:00:00"

ROVERS = {
    # name: (id, landing, launch, status, max_sol, max_date, total_photos)
    "Perseverance": (8, "2021-02-18", "2020-07-30", "active", 1000, "2023-11-21", 250000),
    "Curiosity": (5, "2012-08-05", "2011-11-26", "active", 4000, "2023-10-15", 695000),
    "Opportunity": (6, "2004-01-25", "2003-07-07", "complete", 5111, "2018-06-11", 198439),
    "Spirit": (7, "2004-01-04", "2003-06-10", "complete", 2208, "2010-03-21", 124550),
}

# per-rover manifest sols: {sol: (earth_date, total_photos, cameras)}
MANIFEST_SOLS = {
    "Perseverance": {
        50: ("2021-04-10", 3, ["NAVCAM_LEFT", "MCZ_RIGHT"]),
        51: ("2021-04-11", 2, ["NAVCAM_LEFT"]),
        52: ("2021-04-12", 4, ["NAVCAM_LEFT", "MCZ_RIGHT", "EDL_RUCAM"]),
        53: ("2021-04-13", 1, ["SHERLOC_WATSON"]),
    },
    "Curiosity": {
        1: ("2012-08-06", 2, ["FHAZ", "MAST"]),
        2: ("2012-08-07", 1, ["MARDI"]),
        3: ("2012-08-08", 2, ["CHEMCAM", "FHAZ"]),
    },
    "Opportunity": {
        100: ("2004-05-05", 2, ["PANCAM", "NAVCAM"]),
        101: ("2004-05-06", 2, ["ENTRY", "MINITES"]),
    },
    "Spirit": {
        200: ("2004-07-25", 3, ["PANCAM", "NAVCAM", "UNKNOWN_CAM"]),
    },
}

# photos: (rover, sol, image_id, camera_id, camera_name, sclk_or_None)
PHOTOS = [
    ("Perseverance", 50, 1001, 101, "NAVCAM_LEFT", 666050000),
    ("Perseverance", 50, 1002, 101, "NAVCAM_LEFT", 665000000),
    ("Perseverance", 50, 1003, 102, "MCZ_RIGHT", 666099999),
    ("Perseverance", 52, 1004, 101, "NAVCAM_LEFT", 768850300),
    ("Perseverance", 52, 1005, 102, "MCZ_RIGHT", 768860500),
    ("Perseverance", 52, 1006, 103, "EDL_RUCAM", 768840000),
    ("Perseverance", 52, 1008, 101, "NAVCAM_LEFT", None),  # malformed img_src
    ("Perseverance", 53, 1007, 104, "SHERLOC_WATSON", 770000000),
    ("Curiosity", 1, 2001, 201, "FHAZ", 400000001),
    ("Curiosity", 1, 2002, 202, "MAST", 400000002),
    ("Curiosity", 3, 2003, 203, "CHEMCAM", 400100000),
    ("Opportunity", 100, 3001, 301, "PANCAM", 130000000),
]
# manifest declares but photos don't cover: (Perseverance,51) (Curiosity,2)
# (Opportunity,101) (Spirit,200) -> the MISSING_SOL gap set.

CAMERA_FULL = {
    "NAVCAM_LEFT": "Navigation Camera - Left",
    "MCZ_RIGHT": "Mast Camera Zoom - Right",
    "EDL_RUCAM": "Rover Up-Look Camera",
    "SHERLOC_WATSON": "SHERLOC WATSON Camera",
    "FHAZ": "Front Hazard Avoidance Camera",
    "MAST": "Mast Camera",
    "CHEMCAM": "Chemistry and Camera Complex",
    "PANCAM": "Panoramic Camera",
}

# fact_path features: (rover_or_None, sol, fromRMC, toRMC, length, sclk_start, sclk_end, waypoints)
FEATURES = [
    ("Perseverance", 50, "50_100", "50_200", 33.82, 666000000, 666100000,
     [[77.31, 18.49, -2350.79], [77.32, 18.50, -2350.70], [77.33, 18.51, -2350.60]]),
    ("Perseverance", 51, "51_100", "51_101", 0.0, 700000000, 700001000,
     [[77.33, 18.51, -2350.60]]),
    ("Perseverance", 52, "52_2266", "52_2480", 3.2, 768850261, 768854392,
     [[77.34, 18.52, -2350.50], [77.345, 18.525, -2350.45]]),
    ("Perseverance", 52, "52_2480", "52_2600", 15.0, 768860000, 768861000,
     [[77.345, 18.525, -2350.45], [77.35, 18.53, -2350.40], [77.36, 18.54, -2350.30]]),
    # missing-rover-metadata edge (tests/test_coordinates.py:160-184)
    (None, 52, "52_X", "52_Y", 5.5, 1, 2, [[0.0, 0.0, 0.0]]),
]


def fn_ts(ts):
    # filenames must be Hadoop-path-safe: no colons (the reference's MinIO
    # keys allow them; a Hadoop-backed lake does not)
    return ts.replace(":", "")


def img_src(rover, camera, sol, sclk):
    if sclk is None:
        return f"https://mars.nasa.gov/{rover}/{camera}/sol{sol}/NOTIME_EDR.JPG"
    return f"https://mars.nasa.gov/{rover}/{camera}/{camera}_{sol:05d}_{sclk:010d}_EDR.JPG"


def photo_row(rover, sol, image_id, cam_id, cam_name, sclk):
    rid, landing, launch, status, *_ = ROVERS[rover]
    ed = MANIFEST_SOLS[rover][sol][0]
    return {
        "id": image_id, "sol": sol,
        "camera": {"id": cam_id, "name": cam_name, "rover_id": rid,
                   "full_name": CAMERA_FULL.get(cam_name, cam_name)},
        "img_src": img_src(rover, cam_name, sol, sclk),
        "earth_date": ed,
        "rover": {"id": rid, "name": rover, "landing_date": landing,
                  "launch_date": launch, "status": status},
    }


def main():
    photos = [photo_row(*p) for p in PHOTOS]
    sols = [p[1] for p in PHOTOS]
    photo_doc = {
        "filename": f"mars_rover_photos_batch_sol_{min(sols)}_to_{max(sols)}_{fn_ts(T_PHOTOS)}.json",
        "sol_start": min(sols), "sol_end": max(sols), "photo_count": len(photos),
        "photos": photos, "ingestion_date": T_PHOTOS,
    }

    manifests = []
    for name, (rid, landing, launch, status, max_sol, max_date, total) in ROVERS.items():
        manifests.append({
            "name": name, "landing_date": landing, "launch_date": launch,
            "status": status, "max_sol": max_sol, "max_date": max_date,
            "total_photos": total,
            "photos": [
                {"sol": s, "earth_date": ed, "total_photos": tp, "cameras": cams}
                for s, (ed, tp, cams) in sorted(MANIFEST_SOLS[name].items())
            ],
        })
    manifest_doc = {
        "filename": f"mars_rover_manifests_{fn_ts(T_MANIFESTS)}.json",
        "manifests": manifests, "ingestion_date": T_MANIFESTS,
    }

    features = []
    for rover, sol, frm, to, length, s0, s1, wps in FEATURES:
        features.append({
            "type": "Feature", "rover_name": rover,
            "geometry": {"type": "LineString", "coordinates": wps},
            "properties": {"sol": sol, "fromRMC": frm, "toRMC": to,
                           "length": length, "SCLK_START": s0, "SCLK_END": s1},
        })
    coord_doc = {
        "filename": f"mars_rover_coordinates_{fn_ts(T_COORDS)}.json",
        "coordinate_count": len(features), "coordinates": features,
        "ingestion_date": T_COORDS,
    }

    for fname, doc in [("photos.jsonl", photo_doc),
                       ("manifests.jsonl", manifest_doc),
                       ("coordinates.jsonl", coord_doc)]:
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(json.dumps(doc) + "\n")
        print(f"wrote {fname}")


if __name__ == "__main__":
    main()
