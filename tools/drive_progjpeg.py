import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.multimodal import decode_image_features
from test_multimodal import _jpeg_progressive_bytes, _jpeg_bytes
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false",
                                                 "spark.sql.shuffle.partitions": "4"})
rng = np.random.RandomState(7)
imgs = {i: rng.randint(0, 256, (16+i, 12)).astype(np.float64) for i in range(3)}
rows = [(i, _jpeg_progressive_bytes([img], (1, 1), dc_al=1, ac_al=2), "image/jpeg")
        for i, img in imgs.items()]
rows.append((9, b"\xff\xd8\xff\xc2junk", "image/jpeg"))
media = spark.createDataFrame(rows, "media_id bigint, content binary, media_type string")
got = {r["media_id"]: r for r in decode_image_features(media).collect()}
ok = True
for i, img in imgs.items():
    r = got[i]
    exp_dims = img.shape
    ok &= (r["height"], r["width"]) == exp_dims and r["decode_error"] is None
    print(i, (r["height"], r["width"]), exp_dims, r["decode_error"])
print("corrupt row:", got[9]["decode_error"] is not None)
ok &= got[9]["decode_error"] is not None
print("DRIVE", "OK" if ok else "FAIL")
