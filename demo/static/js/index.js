/* FitCLIP speech-search frontend: query /search and render matched subtitle
 * spans with (when the video id looks like a YouTube id) an embedded player
 * seeked to the span start. */

const form = document.getElementById("search-form");
const queryInput = document.getElementById("query");
const topKInput = document.getElementById("top-k");
const statusLine = document.getElementById("status");
const resultsBox = document.getElementById("results");

function toPattern(raw) {
  const text = raw.trim();
  if (!text) return [];
  if (text.startsWith("[")) return JSON.parse(text);
  // Plain words -> one LOWER spec per word.
  return text.split(/\s+/).map((w) => ({ LOWER: w.toLowerCase() }));
}

function looksLikeYouTubeId(id) {
  return /^[A-Za-z0-9_-]{11}$/.test(id);
}

function render(results) {
  resultsBox.replaceChildren();
  for (const r of results) {
    const card = document.createElement("div");
    card.className = "result";

    const meta = document.createElement("div");
    meta.className = "meta";
    meta.textContent =
      `${r.video_id} · ${r.start_time.toFixed(1)}s – ${r.end_time.toFixed(1)}s`;
    card.appendChild(meta);

    const text = document.createElement("p");
    text.className = "text";
    const mark = document.createElement("mark");
    mark.textContent = r.text;
    text.appendChild(mark);
    card.appendChild(text);

    if (looksLikeYouTubeId(r.video_id)) {
      const player = document.createElement("div");
      player.className = "player";
      const frame = document.createElement("iframe");
      const start = Math.max(0, Math.floor(r.start_time));
      frame.src = `https://www.youtube-nocookie.com/embed/${r.video_id}?start=${start}`;
      frame.loading = "lazy";
      frame.allow = "encrypted-media; picture-in-picture";
      player.appendChild(frame);
      card.appendChild(player);
    }
    resultsBox.appendChild(card);
  }
}

form.addEventListener("submit", async (event) => {
  event.preventDefault();
  let pattern;
  try {
    pattern = toPattern(queryInput.value);
  } catch (err) {
    statusLine.textContent = `Bad pattern: ${err.message}`;
    statusLine.className = "error";
    return;
  }
  statusLine.textContent = "Searching…";
  statusLine.className = "";
  try {
    const params = new URLSearchParams({
      q: JSON.stringify(pattern),
      top_k: topKInput.value || "10",
    });
    const response = await fetch(`/search?${params}`);
    const payload = await response.json();
    if (!response.ok) throw new Error(payload.message || response.statusText);
    statusLine.textContent = `${payload.length} result(s)`;
    render(payload);
  } catch (err) {
    statusLine.textContent = `Search failed: ${err.message}`;
    statusLine.className = "error";
  }
});
