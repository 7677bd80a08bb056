// mtgvision_tpu web client — behavior parity with the reference TS client:
// * frame pump: canvas→JPEG blob→ws with adaptive delay
//   max(sendPeriod, 1.5·server_process_time)   (component-video.ts:240-276)
// * auto-reconnect after 5 s + liveness poll    (util-websocket.ts:60,90-94)
// * EWMA of server timing stats                 (util-websocket.ts:70-83)
// * SVG quad overlay w/ per-track colors        (component-video-overlay-cards.ts)
// * sidebar: crop thumbnails, top-3 matches w/ prices, total deck value
//   (component-sidebar.ts:130-145)
// * settings: device picker (localStorage), period/quality/threshold sliders
//   (util-store.ts:24-26, component-video.ts:97-111)

"use strict";

const state = {
  sendPeriodMs: 1000 / 15,
  sendQuality: 0.7,
  matchThreshold: 0.5,
  detections: [],
  stats: { fps: 0, procTime: 0, period: 0, up: 0, down: 0 },
  wsAlive: false,
  lastMsgTime: 0,
  selectedId: null, // click-to-select (component-video-overlay-cards.ts:107-236)
  // overlay display modes (component-overlay-info.ts selectors)
  modes: { quad: true, mask: true, points: false, labels: true },
};

const $ = (id) => document.getElementById(id);
const video = $("video");
const overlay = $("overlay");
let ws = null;
let sendTimer = null;

// ---------- websocket ----------
function wsUrl() {
  const proto = location.protocol === "https:" ? "wss" : "ws";
  return `${proto}://${location.host}/detect`;
}

function connect() {
  ws = new WebSocket(wsUrl());
  ws.binaryType = "arraybuffer";
  ws.onopen = () => { state.wsAlive = true; scheduleSend(0); };
  ws.onmessage = (ev) => {
    const msg = JSON.parse(ev.data);
    state.detections = msg.detections || [];
    const a = 0.1; // EWMA like the reference stats overlay
    const dt = (performance.now() - state.lastMsgTime) / 1000;
    if (dt > 0 && dt < 10) state.stats.fps = a * (1 / dt) + (1 - a) * state.stats.fps;
    state.stats.procTime = a * (msg.server_process_time * 1000) + (1 - a) * state.stats.procTime;
    state.stats.period = a * (msg.server_process_period * 1000) + (1 - a) * state.stats.period;
    state.stats.up = a * msg.server_recv_im_bytes + (1 - a) * state.stats.up;
    state.stats.down = a * msg.server_send_im_bytes + (1 - a) * state.stats.down;
    state.lastMsgTime = performance.now();
    render();
    // adaptive delay: don't overrun a slow server (component-video.ts:249-253)
    scheduleSend(Math.max(state.sendPeriodMs, 1.5 * state.stats.procTime));
  };
  ws.onclose = () => { state.wsAlive = false; setTimeout(connect, 5000); };
  ws.onerror = () => ws.close();
}
setInterval(() => {  // liveness: if no reply for 2 s, kick the pump again
  if (state.wsAlive && performance.now() - state.lastMsgTime > 2000) scheduleSend(0);
}, 2000);

// ---------- frame pump ----------
const sendCanvas = document.createElement("canvas");
function scheduleSend(delayMs) {
  clearTimeout(sendTimer);
  sendTimer = setTimeout(sendFrame, delayMs);
}
function sendFrame() {
  if (!ws || ws.readyState !== WebSocket.OPEN || video.videoWidth === 0) {
    scheduleSend(200);
    return;
  }
  sendCanvas.width = video.videoWidth;
  sendCanvas.height = video.videoHeight;
  sendCanvas.getContext("2d").drawImage(video, 0, 0);
  sendCanvas.toBlob(
    (blob) => blob && blob.arrayBuffer().then((b) => {
      if (ws.readyState === WebSocket.OPEN) ws.send(b);
    }),
    "image/jpeg",
    state.sendQuality
  );
}

// ---------- camera ----------
async function listDevices() {
  const sel = $("device-select");
  const devs = (await navigator.mediaDevices.enumerateDevices())
    .filter((d) => d.kind === "videoinput");
  sel.innerHTML = "";
  for (const d of devs) {
    const o = document.createElement("option");
    o.value = d.deviceId;
    o.textContent = d.label || `camera ${sel.length + 1}`;
    sel.appendChild(o);
  }
  const saved = localStorage.getItem("mtgv-device");
  if (saved) sel.value = saved;
  sel.onchange = () => {
    localStorage.setItem("mtgv-device", sel.value);
    startCamera(sel.value);
  };
  return sel.value || undefined;
}

async function startCamera(deviceId) {
  if (video.srcObject) video.srcObject.getTracks().forEach((t) => t.stop());
  const stream = await navigator.mediaDevices.getUserMedia({
    video: { width: 640, height: 480, deviceId: deviceId ? { exact: deviceId } : undefined },
  });
  video.srcObject = stream;
}

// ---------- render ----------
function toggleSelect(id) {
  // selection diffing semantics of the reference overlay
  // (component-video-overlay-cards.ts:107-236): click selects, click again
  // (or clicking another track) moves/clears the highlight
  state.selectedId = state.selectedId === id ? null : id;
  render();
}

function render() {
  const w = video.videoWidth || 640;
  const h = video.videoHeight || 480;
  const m = state.modes;
  overlay.setAttribute("viewBox", `0 0 ${w} ${h}`);
  overlay.innerHTML = state.detections
    .map((d) => {
      const sel = d.id === state.selectedId;
      const sw = sel ? 4 : 2;
      const quad = (d.polygon_closed || []).map((p) => p.join(",")).join(" ");
      const hit = `<polygon class="hit" data-id="${d.id}" points="${quad}" fill="${sel ? d.color + "33" : "transparent"}" stroke="none"/>`;
      const closed = m.quad && quad
        ? `<polygon points="${quad}" fill="none" stroke="${d.color}" stroke-width="${sw}"/>`
        : "";
      // raw mask outline — a DIFFERENT polygon than the closed quad
      // (server sends the traced proto-mask contour incl. the notch)
      const mask = m.mask && d.polygon?.length
        ? `<polygon points="${d.polygon.map((p) => p.join(",")).join(" ")}" fill="none" stroke="${d.color}" stroke-width="1" stroke-dasharray="4 3" opacity="0.8"/>`
        : "";
      const pts = m.points && d.points?.length
        ? d.points.map((p) => `<circle cx="${p[0]}" cy="${p[1]}" r="${sw}" fill="${d.color}"/>`).join("")
        : "";
      const top = m.quad && d.polygon_closed?.length >= 2
        ? `<line x1="${d.polygon_closed[0][0]}" y1="${d.polygon_closed[0][1]}" x2="${d.polygon_closed[1][0]}" y2="${d.polygon_closed[1][1]}" stroke="red" stroke-width="${sw + 1}"/>`
        : "";
      const name = d.matches?.[0]?.name ?? "";
      const label = m.labels && d.polygon_closed?.length
        ? `<text x="${d.polygon_closed[0][0]}" y="${d.polygon_closed[0][1] - 6}" fill="${d.color}" font-size="14">${name}</text>`
        : "";
      return `<g>${hit}${closed}${mask}${top}${pts}${label}</g>`;
    })
    .join("");
  overlay.querySelectorAll(".hit").forEach((el) => {
    el.onclick = () => toggleSelect(el.dataset.id);
  });

  // sidebar
  const thr = state.matchThreshold;
  let total = 0;
  $("tracks").innerHTML = state.detections
    .map((d) => {
      const matches = (d.matches || []).filter((m2) => m2.score >= thr);
      const best = matches[0];
      const price = parseFloat(best?.all_data?.prices?.usd ?? "");
      if (!isNaN(price)) total += price;
      const sel = d.id === state.selectedId ? " selected" : "";
      return `<div class="track${sel}" data-id="${d.id}">
        <div class="track-head">
          ${d.img ? `<img src="data:image/jpeg;base64,${d.img}">` : ""}
          <div><span class="swatch" style="background:${d.color}"></span>
          <b>${best?.name ?? "…"}</b><br>
          <small>${best?.set_code?.toUpperCase?.() ?? ""} ${isNaN(price) ? "" : "$" + price.toFixed(2)}</small></div>
        </div>
        ${matches.map((m2) =>
          `<div class="match"><span>${m2.name} <small>(${m2.set_code ?? ""})</small>
           ${renderSymbols(m2.all_data?.mana_cost)}</span>
           <span class="score">${(m2.score * 100).toFixed(0)}%</span></div>`).join("")}
        ${best?.all_data?.oracle_text ? `<div style="font-size:11px;color:#999;margin-top:4px">${renderSymbols(best.all_data.oracle_text)}</div>` : ""}
      </div>`;
    })
    .join("");
  document.querySelectorAll("#tracks .track").forEach((el) => {
    el.onclick = () => toggleSelect(el.dataset.id);
  });
  $("deck-value").textContent = total > 0 ? `Deck value: $${total.toFixed(2)}` : "";

  $("stats").textContent =
    `${state.stats.fps.toFixed(1)} fps | proc ${state.stats.procTime.toFixed(1)} ms | period ${state.stats.period.toFixed(1)} ms\n` +
    `↑ ${(state.stats.up / 1024).toFixed(1)} KiB | ↓ ${(state.stats.down / 1024).toFixed(1)} KiB\n` +
    `tracks ${state.detections.length} | ws ${state.wsAlive ? "ok" : "reconnecting"}`;
}

// ---------- scryfall symbology (scryfall.ts:8-56 parity) ----------
// replaces {W}/{2}{U}-style tokens with inline SVG icons; degrades to plain
// text when api.scryfall.com is unreachable (zero-egress deployments).
const symbology = {};
(async function fetchSymbology() {
  try {
    const r = await fetch("https://api.scryfall.com/symbology");
    const data = await r.json();
    for (const s of data.data || []) symbology[s.symbol] = s.svg_uri;
  } catch (_) { /* offline: tokens stay textual */ }
})();
function renderSymbols(text) {
  if (!text) return "";
  return String(text).replace(/\{[^}]+\}/g, (tok) =>
    symbology[tok]
      ? `<img src="${symbology[tok]}" style="height:1em;vertical-align:-0.15em">`
      : tok
  );
}

// ---------- controls ----------
function bindSlider(id, apply, fmt = (v) => v) {
  const el = $(id);
  const show = () => ($(`${id}-v`).textContent = fmt(el.value));
  el.oninput = () => { apply(parseFloat(el.value)); show(); };
  show();
}
bindSlider("period", (v) => (state.sendPeriodMs = v));
bindSlider("quality", (v) => (state.sendQuality = v / 100));
bindSlider("threshold", (v) => (state.matchThreshold = v / 100));
for (const mode of ["quad", "mask", "points", "labels"]) {
  const el = $(`mode-${mode}`);
  if (el) el.onchange = () => { state.modes[mode] = el.checked; render(); };
}

// ---------- boot ----------
(async () => {
  try {
    await startCamera(await listDevices());
    await listDevices(); // labels appear after permission
  } catch (e) {
    $("stats").textContent = `camera error: ${e.message}`;
  }
  connect();
  render();
})();
