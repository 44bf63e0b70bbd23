package graft.planner

import graft.pipeline.StageRepair
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/**
 * Live HTTP [[Planner]] — the drop-in behind the seam the rest of the
 * engine already consumes (`PromptBuilder` builds the request,
 * `TransformResponse.parse andThen toPlan` consumes the reply; this
 * class only moves bytes).
 *
 * Wire shape: the reference calls the `@google/generative-ai` SDK
 * (ref: server/index.js:246-320); the REST form that SDK resolves to is
 * `POST {base}/v1beta/models/{model}:generateContent` with body
 * `{contents:[{parts:[{text: prompt}]}], generationConfig:
 * {responseMimeType, responseSchema}}` and reply
 * `{candidates:[{content:{parts:[{text: "<forced-schema json>"}]}}]}`.
 * The API key travels in the `x-goog-api-key` header (not a `?key=`
 * query param — keys in URLs end up in access logs).
 *
 * `baseUrl` is injectable, which is also how the adapter is TESTED in
 * this offline environment: the spec boots a localhost fixture server
 * and drives the full client — same bytes, no egress. Transport errors
 * and non-200s surface as [[HttpPlanner.PlannerHttpException]]; a 200
 * whose body lacks the candidates path fails parsing loudly rather than
 * returning an empty plan.
 */
object HttpPlanner {
  final class PlannerHttpException(val status: Int, msg: String)
    extends RuntimeException(msg)

  /** Shared generateContent POST: parts in, forced-schema reply text
    * out. Used by both the text planner and the voice transcriber —
    * the surfaces differ only in their parts list. */
  private[planner] def generateContent(
      client: HttpClient, baseUrl: String, apiKey: String, model: String,
      timeout: Duration, parts: List[JObject],
      responseMimeType: String, responseSchema: JObject): String = {
    val body: JObject =
      ("contents" -> List(("parts" -> parts): JObject)) ~
      ("generationConfig" ->
        (("responseMimeType" -> responseMimeType) ~
          ("responseSchema" -> responseSchema)))
    val http = HttpRequest.newBuilder(
        URI.create(s"$baseUrl/v1beta/models/$model:generateContent"))
      .header("Content-Type", "application/json")
      .header("x-goog-api-key", apiKey)
      .timeout(timeout)
      .POST(HttpRequest.BodyPublishers.ofString(
        JsonMethods.compact(JsonMethods.render(body))))
      .build()
    val resp = client.send(http, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new PlannerHttpException(resp.statusCode(),
        s"generateContent failed: HTTP ${resp.statusCode()}: " +
          resp.body().take(500))
    extractText(resp.body())
  }

  /** Pull `candidates[0].content.parts[*].text` (parts concatenate, per
    * the SDK's `response.text()`); anything else is a malformed reply. */
  private def extractText(body: String): String = {
    val texts = JsonMethods.parse(body) \ "candidates" match {
      case JArray(c0 :: _) =>
        c0 \ "content" \ "parts" match {
          case JArray(parts) => parts.collect { case p =>
            p \ "text" match { case JString(t) => t; case _ => "" } }
          case _ => Nil
        }
      case _ => Nil
    }
    val text = texts.mkString
    if (text.isEmpty)
      throw new PlannerHttpException(200,
        s"malformed generateContent reply (no candidates text): ${body.take(500)}")
    text
  }
}

final class HttpPlanner(
    baseUrl: String,
    apiKey: String,
    schemaOf: StageRepair.SchemaLookup,
    model: String = PromptBuilder.ModelId,
    timeout: Duration = Duration.ofSeconds(30)) extends Planner {

  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .build()

  override def plan(userPrompt: String, schemas: Seq[TableSchema]): Plan = {
    val req = PromptBuilder.transformRequest(userPrompt, schemas)
    val text = HttpPlanner.generateContent(client, baseUrl, apiKey, model,
      timeout, List(("text" -> req.prompt): JObject),
      req.responseMimeType, req.responseSchema)
    TransformResponse.toPlan(TransformResponse.parse(text), schemaOf)
  }
}

/**
 * Live HTTP [[VoiceTranscriber]] — same wire as [[HttpPlanner]] with the
 * audio blob as a second part: `[{text: prompt}, {inline_data:
 * {mime_type, data: base64}}]`, matching the reference's
 * `model.generateContent([prompt, audioPart])` order
 * (ref: server/index.js:1073-1082). The JSON-forced reply goes through
 * [[VoicePromptBuilder.normalize]] — transcript extraction, invalid-audio
 * field stripping — exactly like the mock path, so gating behavior is
 * transport-independent.
 */
final class HttpVoiceTranscriber(
    baseUrl: String,
    apiKey: String,
    model: String = VoicePromptBuilder.ModelId,
    timeout: Duration = Duration.ofSeconds(60)) extends VoiceTranscriber {

  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .build()

  def command(audio: Array[Byte], schema: Seq[(String, String)],
      allSchemas: Seq[TableSchema]): VoicePromptBuilder.VoiceCommandResponse =
    command(audio, schema, allSchemas, VoicePromptBuilder.DefaultAudioMimeType)

  def command(audio: Array[Byte], schema: Seq[(String, String)],
      allSchemas: Seq[TableSchema], audioMimeType: String)
      : VoicePromptBuilder.VoiceCommandResponse = {
    val req = VoicePromptBuilder.buildRequest(schema, allSchemas, audioMimeType)
    val audioB64 = java.util.Base64.getEncoder.encodeToString(audio)
    val parts = List(
      ("text" -> req.prompt): JObject,
      ("inline_data" ->
        (("mime_type" -> req.audioMimeType) ~ ("data" -> audioB64))): JObject)
    val text = HttpPlanner.generateContent(client, baseUrl, apiKey, model,
      timeout, parts, req.responseMimeType, req.responseSchema)
    VoicePromptBuilder.normalize(JsonMethods.parse(text))
  }
}

/**
 * Live HTTP chat-audio loop (`/api/voice/chat-audio`,
 * ref: server/index.js:1150-1310): history-aware prompt + the audio
 * inline_data part through the same generateContent wire, reply parsed
 * into the `{transcript, response, shouldTransform}` [[ChatAudioBuilder
 * .ChatTurn]] contract. `shouldTransform` defaults FALSE when absent —
 * the conservative side of the gate (never auto-run a transformation the
 * model didn't explicitly confirm).
 */
final class HttpChatAudio(
    baseUrl: String,
    apiKey: String,
    model: String = ChatAudioBuilder.ModelId,
    timeout: Duration = Duration.ofSeconds(60)) {

  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .build()

  def turn(audio: Array[Byte], schema: Seq[(String, String)],
      history: Seq[ChatAudioBuilder.ChatMessage],
      audioMimeType: String = VoicePromptBuilder.DefaultAudioMimeType)
      : ChatAudioBuilder.ChatTurn = {
    val req = ChatAudioBuilder.buildRequest(schema, history, audioMimeType)
    val audioB64 = java.util.Base64.getEncoder.encodeToString(audio)
    val parts = List(
      ("text" -> req.prompt): JObject,
      ("inline_data" ->
        (("mime_type" -> req.audioMimeType) ~ ("data" -> audioB64))): JObject)
    val text = HttpPlanner.generateContent(client, baseUrl, apiKey, model,
      timeout, parts, req.responseMimeType, req.responseSchema)
    val jv = JsonMethods.parse(text)
    def str(field: String, dflt: String): String = jv \ field match {
      case JString(s) => s
      case _          => dflt
    }
    ChatAudioBuilder.ChatTurn(
      transcript = str("transcript", ""),
      response = str("response", ""),
      shouldTransform = jv \ "shouldTransform" match {
        case JBool(b) => b
        case _        => false
      })
  }
}
