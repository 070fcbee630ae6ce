package graft.exec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Model persistence (the reference's pickled-artifact story,
  * `README.rst:34-38`, mapped to MLWriter-style explicit save/load,
  * SURVEY §1.4): every fitted model serializes to a single JSON document
  * with a `type` discriminator, so an OvR/forest/search artifact survives
  * the session and reloads to bit-identical predictions. Trees are
  * flattened to columnar arrays (feature/threshold/child indices per
  * node) — the same shape Spark ML's own tree writers use — instead of
  * reflecting over the recursive Node graph.
  *
  * JSON over java serialization: human-auditable, version-tolerant, and
  * not tied to JVM class file compatibility.
  */
object ModelIO {

  // ---- tree flattening ------------------------------------------------

  private def treeToJson(t: CART.TreeModel): JObject = {
    // pre-order walk recording child slots after allocation
    val feature = scala.collection.mutable.ArrayBuffer.empty[Int]
    val threshold = scala.collection.mutable.ArrayBuffer.empty[Double]
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    val value = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val leafId = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walk(n: CART.Node): Int = {
      val id = feature.length
      feature += n.feature; threshold += n.threshold
      left += -1; right += -1
      value += (if (n.value == null) Array.empty[Double] else n.value)
      leafId += n.leafId
      if (!n.isLeaf) {
        val l = walk(n.left); val r = walk(n.right)
        left(id) = l; right(id) = r
      }
      id
    }
    walk(t.root)
    JObject(
      "type" -> JString("tree"),
      "nClasses" -> JInt(t.nClasses),
      "nLeaves" -> JInt(t.nLeaves),
      "feature" -> JArray(feature.map(JInt(_)).toList),
      "threshold" -> JArray(threshold.map(JDouble).toList),
      "left" -> JArray(left.map(JInt(_)).toList),
      "right" -> JArray(right.map(JInt(_)).toList),
      "leafId" -> JArray(leafId.map(JInt(_)).toList),
      "value" -> JArray(value.map(v => JArray(v.map(JDouble).toList)).toList))
  }

  private def treeFromJson(j: JValue): CART.TreeModel = {
    val feature = intArr(j \ "feature")
    val threshold = dblArr(j \ "threshold")
    val left = intArr(j \ "left")
    val right = intArr(j \ "right")
    val leafId = intArr(j \ "leafId")
    val value = (j \ "value").asInstanceOf[JArray].arr.map(dblArr).toArray
    def build(i: Int): CART.Node =
      if (left(i) < 0)
        new CART.Node(feature(i), threshold(i), null, null,
          if (value(i).isEmpty) null else value(i), leafId(i))
      else
        new CART.Node(feature(i), threshold(i), build(left(i)), build(right(i)),
          if (value(i).isEmpty) null else value(i), leafId(i))
    CART.TreeModel(build(0), intOf(j \ "nClasses"), intOf(j \ "nLeaves"))
  }

  // ---- model codec ----------------------------------------------------

  def toJson(model: Model): JObject = model match {
    case LogRegModel(weights, k) => JObject(
      "type" -> JString("logreg"),
      "nClasses" -> JInt(k),
      "weights" -> JArray(weights.map(w => JArray(w.map(JDouble).toList)).toList))
    case ConstantModel(v, k) => JObject(
      "type" -> JString("constant"), "value" -> JDouble(v), "nClasses" -> JInt(k))
    case LinearSVCModel(weights, k) => JObject(
      "type" -> JString("linear_svc"),
      "nClasses" -> JInt(k),
      "weights" -> JArray(weights.map(w => JArray(w.map(JDouble).toList)).toList))
    case t: CART.TreeModel => treeToJson(t)
    case graft.search.ForestModel(trees, k) => JObject(
      "type" -> JString("forest"),
      "nClasses" -> JInt(k),
      "trees" -> JArray(trees.map(treeToJson(_): JValue).toList))
    case graft.search.OvRModel(classes, models, norm) => JObject(
      "type" -> JString("ovr"),
      "classes" -> JArray(classes.map(JDouble).toList),
      "norm" -> norm.map(JString).getOrElse(JNull),
      "models" -> JArray(models.map(toJson(_): JValue).toList))
    case GBT.GBTModel(prior, trees, lr, nClasses) => JObject(
      // the stage axis carries whatever early stopping left: a truncated
      // model round-trips as-is
      "type" -> JString("gbt"),
      "nClasses" -> JInt(nClasses),
      "lr" -> JDouble(lr),
      "prior" -> JArray(prior.map(JDouble).toList),
      "trees" -> JArray(trees.map(stage =>
        JArray(stage.map(treeToJson(_): JValue).toList): JValue).toList))
    case graft.search.OvOModel(classes, pairs, models) => JObject(
      "type" -> JString("ovo"),
      "classes" -> JArray(classes.map(JDouble).toList),
      "pairA" -> JArray(pairs.map(p => JDouble(p._1)).toList),
      "pairB" -> JArray(pairs.map(p => JDouble(p._2)).toList),
      "models" -> JArray(models.map(toJson(_): JValue).toList))
    case other => throw new IllegalArgumentException(
      s"no JSON codec for model type ${other.getClass.getName}")
  }

  def modelFromJson(j: JValue): Model = strOf(j \ "type") match {
    case "logreg" => LogRegModel(
      (j \ "weights").asInstanceOf[JArray].arr.map(dblArr).toArray,
      intOf(j \ "nClasses"))
    case "constant" => ConstantModel(dblOf(j \ "value"), intOf(j \ "nClasses"))
    case "linear_svc" => LinearSVCModel(
      (j \ "weights").asInstanceOf[JArray].arr.map(dblArr).toArray,
      intOf(j \ "nClasses"))
    case "tree" => treeFromJson(j)
    case "forest" => graft.search.ForestModel(
      (j \ "trees").asInstanceOf[JArray].arr.map(treeFromJson).toArray,
      intOf(j \ "nClasses"))
    case "ovr" => graft.search.OvRModel(
      dblArr(j \ "classes"),
      (j \ "models").asInstanceOf[JArray].arr.map(modelFromJson).toArray,
      j \ "norm" match { case JString(s) => Some(s); case _ => None })
    case "gbt" => GBT.GBTModel(
      dblArr(j \ "prior"),
      (j \ "trees").asInstanceOf[JArray].arr.map(stage =>
        stage.asInstanceOf[JArray].arr.map(treeFromJson).toArray).toArray,
      dblOf(j \ "lr"), intOf(j \ "nClasses"))
    case "ovo" => graft.search.OvOModel(
      dblArr(j \ "classes"),
      dblArr(j \ "pairA").zip(dblArr(j \ "pairB")),
      (j \ "models").asInstanceOf[JArray].arr.map(modelFromJson).toArray)
    case t => throw new IllegalArgumentException(s"unknown model type: $t")
  }

  /** Multilabel OvR carries String classes, so it serializes through its
    * own top-level document rather than the numeric-class Model codec.
    */
  def toJson(model: graft.search.MultilabelOvRModel): JObject = JObject(
    "type" -> JString("multilabel_ovr"),
    "classes" -> JArray(model.classes.map(JString(_)).toList),
    "norm" -> model.norm.map(JString).getOrElse(JNull),
    "models" -> JArray(model.models.map(toJson(_): JValue).toList))

  def multilabelFromJson(j: JValue): graft.search.MultilabelOvRModel =
    graft.search.MultilabelOvRModel(
      strArr(j \ "classes"),
      (j \ "models").asInstanceOf[JArray].arr.map(modelFromJson).toArray,
      j \ "norm" match { case JString(s) => Some(s); case _ => None })

  /** TreeEmbeddingModel is a transformer, not a `Model` (no predict), so
    * like MultilabelOvR it serializes through its own top-level document.
    */
  def toJson(model: graft.search.TreeEmbeddingModel): JObject = JObject(
    "type" -> JString("tree_embedding"),
    "trees" -> JArray(model.trees.map(treeToJson(_): JValue).toList))

  def treeEmbeddingFromJson(j: JValue): graft.search.TreeEmbeddingModel =
    graft.search.TreeEmbeddingModel(
      (j \ "trees").asInstanceOf[JArray].arr.map(treeFromJson).toArray)

  // ---- encoder codec --------------------------------------------------

  import graft.encode.Encoderizer._

  def toJson(model: EncoderizerModel): JObject = JObject(
    "type" -> JString("encoderizer"),
    "featuresCol" -> JString(model.featuresCol),
    "weights" -> JObject(model.weights.toList.sortBy(_._1)
      .map { case (k, v) => k -> (JDouble(v): JValue) }),
    "stages" -> JArray(model.stages.map(stageToJson).toList))

  private def stageToJson(s: FittedStage): JValue = s match {
    case NumericStage(name, med, mean, std) => JObject(
      "kind" -> JString("numeric"), "name" -> JString(name),
      "median" -> JDouble(med), "mean" -> JDouble(mean), "std" -> JDouble(std))
    case OneHotStage(name, vocab) => JObject(
      "kind" -> JString("onehot"), "name" -> JString(name),
      "vocab" -> JArray(vocab.map(JString(_)).toList))
    case MultihotStage(name, vocab) => JObject(
      "kind" -> JString("multihot"), "name" -> JString(name),
      "vocab" -> JArray(vocab.map(JString(_)).toList))
    case MapStage(name, keys) => JObject(
      "kind" -> JString("map"), "name" -> JString(name),
      "keys" -> JArray(keys.map(JString(_)).toList))
    case TextHashStage(name, range, numFeatures, charRange) => JObject(
      "kind" -> JString("texthash"), "name" -> JString(name),
      "lo" -> JInt(range._1), "hi" -> JInt(range._2),
      "numFeatures" -> JInt(numFeatures),
      "charLo" -> charRange.map(r => JInt(r._1): JValue).getOrElse(JNull),
      "charHi" -> charRange.map(r => JInt(r._2): JValue).getOrElse(JNull))
    case other => throw new IllegalArgumentException(
      s"no JSON codec for stage type ${other.getClass.getName}")
  }

  def encoderFromJson(j: JValue): EncoderizerModel = {
    val stages = (j \ "stages").asInstanceOf[JArray].arr.map { s =>
      val name = strOf(s \ "name")
      strOf(s \ "kind") match {
        case "numeric" => NumericStage(name, dblOf(s \ "median"),
          dblOf(s \ "mean"), dblOf(s \ "std"))
        case "onehot" => OneHotStage(name, strArr(s \ "vocab").toSeq)
        case "multihot" => MultihotStage(name, strArr(s \ "vocab").toSeq)
        case "map" => MapStage(name, strArr(s \ "keys").toSeq)
        case "texthash" =>
          val charRange = s \ "charLo" match {
            case JNothing | JNull => None
            case lo => Some((intOf(lo), intOf(s \ "charHi")))
          }
          TextHashStage(name, (intOf(s \ "lo"), intOf(s \ "hi")),
            intOf(s \ "numFeatures"), charRange)
        case k => throw new IllegalArgumentException(s"unknown stage kind: $k")
      }
    }
    val weights = j \ "weights" match {
      case JObject(fields) => fields.map { case (k, v) => k -> dblOf(v) }.toMap
      case _ => Map.empty[String, Double]
    }
    EncoderizerModel(stages, strOf(j \ "featuresCol"), weights)
  }

  // ---- file surface ---------------------------------------------------

  def save(model: Model, path: String): Unit = write(path, toJson(model))
  def save(model: graft.search.MultilabelOvRModel, path: String): Unit =
    write(path, toJson(model))
  def save(model: EncoderizerModel, path: String): Unit =
    write(path, toJson(model))
  def save(model: graft.search.TreeEmbeddingModel, path: String): Unit =
    write(path, toJson(model))

  def loadModel(path: String): Model = modelFromJson(read(path))
  def loadMultilabel(path: String): graft.search.MultilabelOvRModel =
    multilabelFromJson(read(path))
  def loadEncoderizer(path: String): EncoderizerModel = encoderFromJson(read(path))
  def loadTreeEmbedding(path: String): graft.search.TreeEmbeddingModel =
    treeEmbeddingFromJson(read(path))

  private def write(path: String, j: JValue): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      JsonMethods.compact(JsonMethods.render(j))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def read(path: String): JValue =
    JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  // ---- JSON helpers (total, loud on shape mismatch) -------------------

  private def intOf(j: JValue): Int = j match {
    case JInt(v) => v.toInt
    case JLong(v) => v.toInt
    case JDouble(v) => v.toInt
    case other => throw new IllegalArgumentException(s"expected int, got $other")
  }
  private def dblOf(j: JValue): Double = j match {
    case JDouble(v) => v
    case JInt(v) => v.toDouble
    case JLong(v) => v.toDouble
    case JDecimal(v) => v.toDouble
    case other => throw new IllegalArgumentException(s"expected double, got $other")
  }
  private def strOf(j: JValue): String = j match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }
  private def intArr(j: JValue): Array[Int] =
    j.asInstanceOf[JArray].arr.map(intOf).toArray
  private def dblArr(j: JValue): Array[Double] =
    j.asInstanceOf[JArray].arr.map(dblOf).toArray
  private def strArr(j: JValue): Array[String] =
    j.asInstanceOf[JArray].arr.map(strOf).toArray
}
