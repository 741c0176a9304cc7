#!/bin/bash
for f in psnr_bench extract_bench knn_recall probe_final probe_fwd probe_1080p; do
  echo "== $f: $(tail -1 /root/repo/$f.log 2>/dev/null | cut -c1-160)"
done
ls /root/repo/tpu_queue_done.txt 2>/dev/null && echo QUEUE_DONE
ps aux | grep -E "[b]enchmark_psnr|[e]xtract_fullres|[k]nn_recall|[p]erf_probe" | awk '{print $2, $10, $12, $13}'
