"""Interactive 3D scene viewer as a single self-contained HTML file.

TPU-native replacement for the reference's GUI visualizers
(``tools/visual_utils/open3d_vis_utils.py`` / ``visualize_utils.py``):
TPU hosts are headless, so instead of an open3d/mayavi window we write one
HTML file — vanilla JS + canvas, zero external assets (works offline,
scp-able) — with orbit/zoom/pan controls, height/intensity point coloring,
GT boxes (green) and detections (red, score-labeled) with heading marks.

API mirrors the reference's ``draw_scenes(points, gt_boxes, ref_boxes,
ref_scores, ref_labels)`` signature; the extra first argument is the output
path (a window cannot be "shown" here).
"""
import base64
import json
from pathlib import Path

import numpy as np

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>spsnet_tpu scene</title><style>
html,body{margin:0;height:100%;background:#111;overflow:hidden;font:12px monospace}
#c{display:block;width:100%;height:100%}
#hud{position:fixed;top:8px;left:8px;color:#9a9;user-select:none}
#hud b{color:#cfc}
</style></head><body>
<canvas id="c"></canvas>
<div id="hud"><b>spsnet_tpu viewer</b> — drag: orbit · wheel: zoom ·
shift-drag: pan · <b>h</b>: height/intensity color · <b>g</b>/<b>p</b>:
toggle gt/pred boxes<br><span id="info"></span></div>
<script>
"use strict";
const PTS = new Float32Array(b64(PTS_B64));   // x,y,z,i quads
const GT = __GT__;                            // [[x,y,z,dx,dy,dz,ry],..]
const PRED = __PRED__;
const PRED_TXT = __PRED_TXT__;
function b64(s){const r=atob(s),n=r.length,u=new Uint8Array(n);
  for(let i=0;i<n;i++)u[i]=r.charCodeAt(i);return u.buffer;}
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
const NP=PTS.length/4;
// center the orbit target on the cloud centroid
let tx=0,ty=0,tz=0;
for(let i=0;i<NP;i++){tx+=PTS[4*i];ty+=PTS[4*i+1];tz+=PTS[4*i+2];}
tx/=NP||1;ty/=NP||1;tz/=NP||1;
let yaw=-0.8,pitch=0.45,dist=60,panx=0,pany=0;
let colorByHeight=true,showGt=true,showPred=true;
let zmin=1e9,zmax=-1e9,imin=1e9,imax=-1e9;
for(let i=0;i<NP;i++){const z=PTS[4*i+2],it=PTS[4*i+3];
  if(z<zmin)zmin=z;if(z>zmax)zmax=z;if(it<imin)imin=it;if(it>imax)imax=it;}
function ramp(t){ // compact viridis-like ramp
  t=Math.min(1,Math.max(0,t));
  const r=Math.round(255*(0.28+0.72*t*t)),g=Math.round(255*(0.06+0.85*t)),
        b=Math.round(255*(0.53+0.4*t-0.65*t*t));
  return [r,g,b];}
function cam(){
  const cy=Math.cos(yaw),sy=Math.sin(yaw),cp=Math.cos(pitch),sp=Math.sin(pitch);
  // camera basis: forward f points at target
  return {fx:cy*cp,fy:sy*cp,fz:sp, rx:-sy,ry:cy,rz:0,
          ux:-cy*sp,uy:-sy*sp,uz:cp};}
function project(x,y,z,C,W,H,F){
  const dx=x-tx-C.rx*panx-C.ux*pany, dy=y-ty-C.ry*panx-C.uy*pany,
        dz=z-tz-C.rz*panx-C.uz*pany;
  // camera sits at target - dist*f, looking along f: depth = dist + (p-t)·f
  const cz=dist+(dx*C.fx+dy*C.fy+dz*C.fz);
  if(cz<0.5)return null;
  const cx=dx*C.rx+dy*C.ry+dz*C.rz, cyv=dx*C.ux+dy*C.uy+dz*C.uz;
  return [W/2+F*cx/cz, H/2-F*cyv/cz, cz];}
function corners(b){
  const [x,y,z,dx,dy,dz,ry]=b,c=Math.cos(ry),s=Math.sin(ry),out=[];
  for(const sx of[-.5,.5])for(const sy of[-.5,.5])for(const sz of[-.5,.5])
    out.push([x+c*sx*dx-s*sy*dy, y+s*sx*dx+c*sy*dy, z+sz*dz]);
  // heading tick: box center -> front face center
  out.push([x,y,z]);out.push([x+c*0.6*dx,y+s*0.6*dx,z]);
  return out;}
const EDGES=[[0,1],[0,2],[1,3],[2,3],[4,5],[4,6],[5,7],[6,7],
             [0,4],[1,5],[2,6],[3,7],[8,9]];
function drawBoxes(list,color,C,W,H,F,labels){
  ctx.strokeStyle=color;ctx.fillStyle=color;ctx.lineWidth=1.2;
  for(let i=0;i<list.length;i++){
    const cs=corners(list[i]).map(p=>project(p[0],p[1],p[2],C,W,H,F));
    ctx.beginPath();
    for(const [a,b] of EDGES){
      if(!cs[a]||!cs[b])continue;
      ctx.moveTo(cs[a][0],cs[a][1]);ctx.lineTo(cs[b][0],cs[b][1]);}
    ctx.stroke();
    if(labels&&labels[i]&&cs[8])ctx.fillText(labels[i],cs[8][0]+4,cs[8][1]-4);}}
function draw(){
  const W=cv.width=cv.clientWidth*devicePixelRatio,
        H=cv.height=cv.clientHeight*devicePixelRatio,
        F=0.9*Math.min(W,H),C=cam();
  ctx.fillStyle='#111';ctx.fillRect(0,0,W,H);
  const img=ctx.getImageData(0,0,W,H),d=img.data;
  for(let i=0;i<NP;i++){
    const p=project(PTS[4*i],PTS[4*i+1],PTS[4*i+2],C,W,H,F);
    if(!p)continue;
    const px=p[0]|0,py=p[1]|0;
    if(px<0||py<0||px>=W||py>=H)continue;
    const t=colorByHeight?(PTS[4*i+2]-zmin)/(zmax-zmin+1e-9)
                         :(PTS[4*i+3]-imin)/(imax-imin+1e-9);
    const [r,g,b]=ramp(t),o=4*(py*W+px);
    d[o]=r;d[o+1]=g;d[o+2]=b;d[o+3]=255;}
  ctx.putImageData(img,0,0);
  ctx.font=`${11*devicePixelRatio}px monospace`;
  if(showGt)drawBoxes(GT,'#4f4',C,W,H,F,null);
  if(showPred)drawBoxes(PRED,'#f55',C,W,H,F,PRED_TXT);
  document.getElementById('info').textContent=
    `${NP} pts · ${GT.length} gt · ${PRED.length} det · color: `+
    (colorByHeight?'height':'intensity');}
let drag=false,lx=0,ly=0,pan=false;
cv.addEventListener('mousedown',e=>{drag=true;pan=e.shiftKey;lx=e.clientX;ly=e.clientY;});
window.addEventListener('mouseup',()=>drag=false);
window.addEventListener('mousemove',e=>{
  if(!drag)return;
  const mx=e.clientX-lx,my=e.clientY-ly;lx=e.clientX;ly=e.clientY;
  if(pan){panx-=mx*dist*0.0015;pany+=my*dist*0.0015;}
  else{yaw-=mx*0.006;pitch=Math.min(1.5,Math.max(-1.5,pitch+my*0.006));}
  draw();});
cv.addEventListener('wheel',e=>{e.preventDefault();
  dist*=Math.exp(e.deltaY*0.0012);dist=Math.min(500,Math.max(2,dist));draw();});
window.addEventListener('keydown',e=>{
  if(e.key==='h')colorByHeight=!colorByHeight;
  else if(e.key==='g')showGt=!showGt;
  else if(e.key==='p')showPred=!showPred;else return;draw();});
window.addEventListener('resize',draw);
draw();
</script></body></html>
"""


def draw_scenes(out_path, points, gt_boxes=None, ref_boxes=None,
                ref_scores=None, ref_labels=None, class_names=None,
                max_points=200_000):
    """Write an interactive HTML viewer for one scene.

    Args:
        out_path: destination ``.html`` path.
        points: (N, 3+) array; column 3 (when present) is shown as the
            intensity channel.
        gt_boxes: optional (T, 7+) boxes drawn in green.
        ref_boxes: optional (K, 7+) predicted boxes drawn in red.
        ref_scores / ref_labels: optional per-prediction score / int label
            (1-based into ``class_names``) rendered next to each box.
        class_names: label names for the prediction captions.
        max_points: uniform subsample cap keeping the file size sane.
    Returns:
        the written Path.
    """
    points = np.asarray(points, np.float32)
    if points.ndim != 2 or points.shape[1] < 3:
        raise ValueError(f'points must be (N, >=3), got {points.shape}')
    if len(points) > max_points:
        sel = np.random.default_rng(0).choice(
            len(points), max_points, replace=False)
        points = points[sel]
    quads = np.zeros((len(points), 4), np.float32)
    quads[:, :3] = points[:, :3]
    if points.shape[1] > 3:
        quads[:, 3] = points[:, 3]

    def box_list(boxes):
        if boxes is None or len(boxes) == 0:
            return []
        boxes = np.asarray(boxes, np.float32)
        return [[round(float(v), 4) for v in b[:7]] for b in boxes]

    pred = box_list(ref_boxes)
    texts = []
    if pred:
        n = len(pred)
        scores = None if ref_scores is None else np.asarray(ref_scores)
        labels = None if ref_labels is None else np.asarray(ref_labels)
        for i in range(n):
            name = ''
            if labels is not None and class_names:
                li = int(labels[i])
                if 1 <= li <= len(class_names):
                    name = str(class_names[li - 1])
            s = f'{float(scores[i]):.2f}' if scores is not None else ''
            texts.append(f'{name} {s}'.strip())

    html = (_TEMPLATE
            .replace('PTS_B64', json.dumps(
                base64.b64encode(quads.tobytes()).decode('ascii')))
            .replace('__GT__', json.dumps(box_list(gt_boxes)))
            .replace('__PRED__', json.dumps(pred))
            .replace('__PRED_TXT__', json.dumps(texts)))
    out_path = Path(out_path)
    out_path.write_text(html)
    return out_path
